"""Protobuf runtime shim for Spark Python workers (test-only).

``transformWithStateInPandas`` needs the ``google.protobuf`` runtime
in every Python worker, but the harness image ships no pip protobuf.
A modern pure-Python runtime (6.32) does exist on disk inside the
Cloud SDK's App Engine platform directory, one minor version behind
PySpark's generated gencode (6.33). This module — put on PYTHONPATH
by ``tests/conftest.py`` ONLY when ``google.protobuf`` is unusable —
is imported automatically at interpreter startup (``site`` imports
``sitecustomize``), so it runs in every Spark worker before any pb2
module loads. It appends (never prepends — nothing real can be
shadowed) the App Engine path and relaxes the gencode/runtime version
gate, which rejects the benign 6.32-runtime/6.33-gencode minor gap;
message build/serialize/parse roundtrips are exercised by
tests/test_streaming_stateful.py over this exact stack.

The probe imports ``google.protobuf.descriptor`` specifically: on some
paths ``google.protobuf`` resolves as an EMPTY namespace package (a
bare ``import google.protobuf`` succeeds while every real symbol is
missing), so a plain import is not a usable-runtime signal. When the
probe fails, any half-resolved namespace modules are evicted so the
re-import binds to the App Engine regular package.
"""

import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _ensure() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return
    except Exception:
        pass
    if _APPENGINE not in sys.path:
        sys.path.append(_APPENGINE)
    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    import importlib

    importlib.invalidate_caches()
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass


_ensure()
