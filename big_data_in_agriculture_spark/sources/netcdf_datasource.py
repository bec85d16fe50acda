"""`format("netcdf")` — a Spark 4 Python DataSource for the raw layout.

The second ingest path next to ``netcdf.read_raw_grid`` (binaryFile +
mapInPandas), trading its generic file scan for SOURCE-LEVEL partition
pruning: `partitions()` enumerates one `InputPartition` per raw file
AFTER applying the region/year/month options, so a single-month read
plans exactly one task and never lists (let alone opens) other
directories — the Python-DataSource formulation SURVEY §4.3 point 1
recommends for pruning-friendly NetCDF reads.

    spark.dataSource.register(NetCDFDataSource)
    df = (spark.read.format("netcdf")
          .option("path", raw_root)
          .option("region", "bashkortostan")   # optional pruning
          .option("year", "2022")
          .option("month", "2")
          .option("variables", "t2m,u10,v10")
          .load())

Scale notes: file listing happens once on the driver (cheap: it walks
only the pruned subtree); each file decodes inside its own task and is
emitted as Arrow batches. Decode is the same injectable-decoder
contract as `netcdf.read_raw_grid` — tests subclass and override
``_decoder`` (cloudpickle ships the subclass by value to workers);
deployments with xarray installed get `default_decoder`.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .netcdf import (
    DECODED_SCHEMA,
    default_decoder,
    parse_partition_path,
    sniff_netcdf_bytes,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NetCDFDataSource(DataSource):
    """One hive-laid-out NetCDF/ZIP file per input partition."""

    #: override in a subclass to inject a decoder (bytes, vars) -> pdf
    _decoder = staticmethod(default_decoder)

    @classmethod
    def name(cls) -> str:
        return "netcdf"

    def schema(self):
        return DECODED_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _NetCDFReader(self.options, type(self)._decoder)


class _NetCDFReader(DataSourceReader):
    def __init__(self, options: dict, decoder):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("netcdf source requires .option('path', raw_root)")
        self._region = options.get("region", "*")
        self._year = options.get("year", "*")
        month = options.get("month")
        self._month = f"{int(month):02d}" if month else "*"
        vars_opt = options.get("variables")
        self._variables = (
            [v for v in vars_opt.split(",") if v]
            if vars_opt
            else [f.name for f in DECODED_SCHEMA.fields[4:]]
        )
        self._decoder = decoder

    def partitions(self):
        # pruning happens HERE: only the matching subtree is globbed
        pattern = os.path.join(
            self._root,
            f"region={self._region}",
            f"year={self._year}",
            f"month={self._month}.*",
        )
        paths = [
            p
            for p in sorted(_glob.glob(pattern))
            if p.endswith((".nc", ".zip"))
        ]
        # empty list would error ("requires at least one partition");
        # keep S4's missing-partition tolerance with an explicit marker
        return [_FilePartition(p) for p in paths] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa

        if not partition.path:  # missing-partition marker → no rows
            return
        region, _, _ = parse_partition_path(partition.path)
        with open(partition.path, "rb") as f:
            content = f.read()
        frame = self._decoder(sniff_netcdf_bytes(content), self._variables)
        frame = frame.copy()
        frame.insert(0, "region", region)
        out_cols = [f.name for f in DECODED_SCHEMA.fields]
        for col in out_cols:
            if col not in frame.columns:
                frame[col] = None
        frame = frame[out_cols]
        target = pa.schema(
            [("region", pa.string()), ("ts", pa.timestamp("us"))]
            + [(c, pa.float64()) for c in out_cols[2:]]
        )
        table = pa.Table.from_pandas(frame, preserve_index=False).cast(target)
        yield from table.to_batches()
