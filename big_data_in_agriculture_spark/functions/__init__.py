"""Pure Column-expression helpers (no UDFs — everything stays JVM-side)."""
