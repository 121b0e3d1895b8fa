"""Driver-side micro-batch feed writer for streaming tests/demos.

Queries like q99/q100 drive a file-source stream by appending tiny
parquet files between drains. Writing those feeds through
``spark.createDataFrame(...).write.parquet`` costs a full Spark job
each (~5 s of scheduling for 3 rows, measured — it dominated q100's
runtime); the rows are literal driver-side constants, so pyarrow can
write the file directly with zero jobs.

Timestamps are written tz-aware UTC (``isAdjustedToUTC=true`` in the
parquet footer) so Spark's file source reads them as TIMESTAMP_LTZ —
matching what ``createDataFrame`` produced under a UTC session and
dodging the NTZ/LTZ sniffing gotcha documented in the verify skill.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

_TYPES = {
    "int": pa.int32(),
    "bigint": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "timestamp": pa.timestamp("us", tz="UTC"),
}


def append_feed(path: str, schema: str, rows: list[tuple]) -> None:
    """Append one parquet file of literal ``rows`` under ``path``.

    ``schema`` is the same DDL string handed to ``readStream.schema``
    (``"ad_id int, ts timestamp, v double"``); supported types:
    int/bigint/double/string/timestamp. Naive datetimes are taken as
    wall-clock UTC (the streaming queries pin the session TZ to UTC).
    """
    fields = []
    for part in schema.split(","):
        name, typ = part.split()
        fields.append((name, _TYPES[typ.lower()]))
    arrays = []
    for i, (name, typ) in enumerate(fields):
        vals = [r[i] for r in rows]
        if isinstance(typ, pa.TimestampType):
            # naive -> taken as wall-clock UTC; aware -> CONVERTED to
            # UTC (stripping the tzinfo without converting would
            # silently shift the instant by the offset)
            vals = [
                (
                    v.astimezone(timezone.utc).replace(tzinfo=None)
                    if v.tzinfo is not None
                    else v
                )
                if isinstance(v, datetime)
                else v
                for v in vals
            ]
        arrays.append(pa.array(vals, type=typ))
    table = pa.Table.from_arrays(arrays, names=[f[0] for f in fields])
    pq.write_table(table, f"{path}/feed-{uuid.uuid4().hex}.parquet")
