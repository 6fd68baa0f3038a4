"""A PySpark Python Data Source for the remote-landing step (op S3).

`io/landing.py` lands files driver-side — correct for metadata-scale
listings, but serial. This module makes the remote landing a
first-class Spark SOURCE via the PySpark 4 Python Data Source API
(`pyspark.sql.datasource`): one input partition per remote file, so
the fetch+parse fans out across executors and the listing is the only
driver-side step. Reference behavior being re-expressed: the SFTP
download+validate loop at `data_ingestion/ingest.py:161-288`.

Usage:

    spark.dataSource.register(RemoteLandingDataSource)
    df = spark.read.format("remote_landing").load()          # mock fixture
    df = (spark.read.format("remote_landing")
          .option("host", ...).option("username", ...).load())  # real SFTP

Values arrive as strings bound by HEADER NAME (missing columns → null),
matching the engine's CSV contract (`readers.read_flights_csv`): parse
to strings at the edge, cast declaratively downstream so Catalyst sees
the casts. Connections are constructed PER PARTITION — a live client
cannot ride the serialized plan; executors open their own (the standard
datasource pattern). On a multi-node cluster ship the package via
--py-files; in local mode the executors share the driver's sys.path.
"""

from __future__ import annotations

import csv
import json
import os
import tempfile

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# The mock fixture's header (the reference's raw flight feed columns).
_DEFAULT_COLUMNS = [
    "FL_DATE", "OP_CARRIER", "OP_CARRIER_FL_NUM", "ORIGIN", "DEST",
    "CRS_DEP_TIME", "DEP_TIME", "CRS_ARR_TIME", "ARR_TIME",
]


def _make_client(options):
    """Per-partition client: mock (default or json-supplied fixture) or
    real SFTP when connection options are present."""
    from airline_data_pipeline_spark.io.landing import (
        MockRemoteClient,
        connect_sftp,
    )

    if "host" in options:
        return connect_sftp(
            options["host"],
            int(options.get("port", "22")),
            options.get("username", ""),
            options.get("password", ""),
        )
    files_json = options.get("files_json")
    if files_json:
        return MockRemoteClient(
            {k: v.encode() for k, v in json.loads(files_json).items()}
        )
    return MockRemoteClient()


class _RemoteFilePartition(InputPartition):
    def __init__(self, name: str):
        self.name = name


class _RemoteLandingReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        self._options = options

    def partitions(self):
        client = _make_client(self._options)
        return [
            _RemoteFilePartition(n)
            for n in client.listdir(".")
            if n.endswith(".csv")
        ]

    def read(self, partition):
        client = _make_client(self._options)
        names = [f.name for f in self._schema.fields]
        yield from _read_rows(client, partition.name, names)


def _read_rows(client, name: str, field_names):
    local = os.path.join(
        tempfile.mkdtemp(prefix="spark_graft_remote_landing_"), name
    )
    client.get(name, local)
    with open(local, newline="") as fh:
        for row in csv.DictReader(fh):
            yield tuple(
                (row.get(n) or None) if row.get(n, "") != "" else None
                for n in field_names
            )


class _RemoteLandingStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch landing: each batch ingests every remote CSV not yet
    processed. The offset is the sorted list of consumed file names —
    JSON-serializable, so checkpoint recovery replays exactly
    (`readBetweenOffsets` re-reads the files the batch covered). New
    files appearing between triggers form the next batch; under
    AvailableNow's single-batch fallback one batch drains everything
    currently listed.
    """

    def __init__(self, schema, options):
        self._schema = schema
        self._options = options

    def _listing(self):
        client = _make_client(self._options)
        return client, sorted(
            n for n in client.listdir(".") if n.endswith(".csv")
        )

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        client, listing = self._listing()
        done = set(start["files"])
        new = [n for n in listing if n not in done]
        names = [f.name for f in self._schema.fields]
        rows = [r for n in new for r in _read_rows(client, n, names)]
        return iter(rows), {"files": sorted(done | set(new))}

    def readBetweenOffsets(self, start, end):
        client = _make_client(self._options)
        names = [f.name for f in self._schema.fields]
        replay = sorted(set(end["files"]) - set(start["files"]))
        return iter([r for n in replay for r in _read_rows(client, n, names)])


class RemoteLandingDataSource(DataSource):
    @classmethod
    def name(cls):
        return "remote_landing"

    def schema(self):
        return ", ".join(f"`{c}` string" for c in _DEFAULT_COLUMNS)

    def reader(self, schema):
        return _RemoteLandingReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return _RemoteLandingStreamReader(schema, self.options)
