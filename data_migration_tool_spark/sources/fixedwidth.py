"""Fixed-width record source — Spark 4 Python DataSource API.

Legacy warehouse exports (mainframe / Teradata FastExport-style) arrive
as fixed-width text: no delimiter, each column a byte range. The
reference's load surface stops at delimited CSV; this fills the gap as
a first-class ``spark.read.format("fixedwidth")`` source rather than a
driver-side preprocessor, using the Python DataSource API
(``pyspark.sql.datasource``, SPARK-44076).

Usage::

    spark.dataSource.register(FixedWidthDataSource)
    df = (spark.read.format("fixedwidth")
          .schema("id INT, name STRING, score DOUBLE")
          .option("path", "/data/export")        # file or directory
          .option("widths", "6,12,8")            # one per schema field
          .load())

Scale: one input partition PER FILE (legacy exports ship as many
fixed-size files), so parallelism follows the file listing exactly like
the built-in text source; each partition streams its file line by line
— nothing is materialized. Parsing is per-field slicing + typed
conversion; blank-padded strings are right-trimmed, blank numerics
become NULL (the mainframe convention).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _convert(raw: str, dtype) -> object:
    s = raw.strip()
    if isinstance(dtype, StringType):
        return raw.rstrip()
    if not s:
        return None
    if isinstance(dtype, (IntegerType, LongType)):
        return int(s)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(s)
    if isinstance(dtype, DateType):
        import datetime

        return datetime.date.fromisoformat(s)
    raise TypeError(f"fixedwidth: unsupported field type {dtype}")


class FixedWidthReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("fixedwidth: 'path' option is required")
        widths_opt = options.get("widths")
        if not widths_opt:
            raise ValueError("fixedwidth: 'widths' option is required")
        self._widths = [int(w) for w in str(widths_opt).split(",")]
        if len(self._widths) != len(schema.fields):
            raise ValueError(
                f"fixedwidth: {len(self._widths)} widths for "
                f"{len(schema.fields)} schema fields"
            )
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
        else:
            self._files = [path]

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        starts = []
        pos = 0
        for w in self._widths:
            starts.append(pos)
            pos += w
        dtypes = [f.dataType for f in self._schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                yield tuple(
                    _convert(line[s : s + w], t)
                    for s, w, t in zip(starts, self._widths, dtypes)
                )


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> str:
        raise ValueError(
            "fixedwidth: an explicit .schema(...) is required (widths "
            "carry no type information)"
        )

    def reader(self, schema: StructType) -> FixedWidthReader:
        return FixedWidthReader(schema, self.options)
