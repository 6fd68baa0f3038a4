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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class _StagedFile(WriterCommitMessage):
    """Commit message: the staged file one write task produced."""

    def __init__(self, staged_path: str):
        self.staged_path = staged_path


class _RemoteLandingWriter(DataSourceWriter):
    """Two-phase-commit CSV export writer (the landing dir's WRITE side —
    the engine's analogue of the reference's outbound `to_csv` exports,
    `ingest.py:337`, as a distributed sink).

    Each write task streams its partition to a private staged file
    (`_staged/<uuid>.csv`, header included); only `commit` — called
    once, driver-side, after EVERY task reported success — moves the
    staged files into the destination and drops a `_SUCCESS` marker.
    A failed/aborted job leaves the destination untouched (`abort`
    deletes the strays), so concurrent readers never observe a
    half-written export: the visibility flip is the commit, exactly
    the contract Spark's built-in FileOutputCommitter provides. For a
    real SFTP landing the staged-file move becomes the remote `put` —
    the protocol is unchanged.
    """

    def __init__(self, schema, options, overwrite: bool):
        self._names = [f.name for f in schema.fields]
        self._path = options.get("path")
        if not self._path:
            raise ValueError("remote_landing writer requires .option('path', ...)")
        self._overwrite = overwrite

    def _staging(self) -> str:
        return os.path.join(self._path, "_staged")

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        os.makedirs(self._staging(), exist_ok=True)
        staged = os.path.join(self._staging(), f"{uuid.uuid4().hex}.csv")
        n = 0
        with open(staged, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(self._names)
            for row in iterator:
                w.writerow(["" if v is None else v for v in row])
                n += 1
        if n == 0:
            # empty partition: nothing staged, nothing to commit
            os.remove(staged)
            return _StagedFile("")
        return _StagedFile(staged)

    def commit(self, messages) -> None:
        import shutil

        if self._overwrite:
            for f in os.listdir(self._path):
                if f.endswith(".csv") and not f.startswith("_"):
                    os.remove(os.path.join(self._path, f))
        # Destination names keep the staged file's job-unique uuid so an
        # append into a directory holding a prior export NEVER collides
        # with (and silently clobbers) the earlier job's part files —
        # fixed part-NNNNN names would. Mirrors Spark's own
        # part-<task>-<jobUUID> naming.
        for i, m in enumerate(messages):
            if m.staged_path:
                uid = os.path.splitext(os.path.basename(m.staged_path))[0]
                os.replace(
                    m.staged_path,
                    os.path.join(self._path, f"part-{i:05d}-{uid}.csv"),
                )
        shutil.rmtree(self._staging(), ignore_errors=True)
        with open(os.path.join(self._path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


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

    def writer(self, schema, overwrite: bool):
        return _RemoteLandingWriter(schema, self.options, overwrite)


class _StagedBlobs(WriterCommitMessage):
    """Commit message: (staged_path, file_name) pairs one task wrote."""

    def __init__(self, staged: list[tuple[str, str]]):
        self.staged = staged


class _BinaryFilesWriter(DataSourceWriter):
    """Two-phase-commit BINARY-BLOB sink — the write side Spark's
    built-in `binaryFile` source never got (SPARK-25348 added only the
    read path). One file per row: (file_name, content) → dest/file_name.
    The media-export stage of the multimodal pipeline (§2.10): resized
    images / sampled frames leave the engine as real files.

    Same protocol as `_RemoteLandingWriter` above: tasks stage blobs
    under a private `_staged/<uuid>/` dir, and only the driver-side
    `commit` — after every task succeeded — moves them into the
    destination and drops `_SUCCESS`, so readers never observe a
    partial export. Unlike part files, names here are CALLER-chosen
    data, so commit enforces what Spark's committer gets for free from
    task-unique part names: a duplicate name within the job, or (in
    append mode) a collision with a file already in the destination,
    fails the job BEFORE any move instead of silently clobbering.
    """

    def __init__(self, schema, options, overwrite: bool):
        names = [f.name for f in schema.fields]
        self._name_col = options.get("name_col", "file_name")
        self._content_col = options.get("content_col", "content")
        missing = {self._name_col, self._content_col} - set(names)
        if missing:
            raise ValueError(
                f"binary_files writer: input lacks columns {sorted(missing)}; "
                f"got {names}"
            )
        self._name_idx = names.index(self._name_col)
        self._content_idx = names.index(self._content_col)
        self._path = options.get("path")
        if not self._path:
            raise ValueError("binary_files writer requires .option('path', ...)")
        self._overwrite = overwrite

    def _staging(self) -> str:
        return os.path.join(self._path, "_staged")

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        task_dir = os.path.join(self._staging(), uuid.uuid4().hex)
        os.makedirs(task_dir, exist_ok=True)
        staged: list[tuple[str, str]] = []
        for row in iterator:
            name = row[self._name_idx]
            content = row[self._content_idx]
            if name is None or content is None:
                raise ValueError(
                    "binary_files writer: NULL file_name/content row "
                    "(a blob with no name or no bytes is a caller bug)"
                )
            # basename() passes '.' and '..' through unchanged, so they
            # must be rejected explicitly — otherwise they only fail
            # later with an unrelated open() error inside the task
            if (
                os.path.basename(name) != name
                or name in (".", "..")
                or name.startswith("_")
            ):
                raise ValueError(
                    f"binary_files writer: illegal file name {name!r} "
                    "(no path separators or '.'/'..'; names starting "
                    "with '_' are reserved for markers)"
                )
            p = os.path.join(task_dir, name)
            with open(p, "wb") as fh:
                fh.write(bytes(content))
            staged.append((p, name))
        return _StagedBlobs(staged)

    def commit(self, messages) -> None:
        import shutil

        # every partition may have been empty — the staging dir (and
        # with it the destination) is only made by tasks that wrote
        os.makedirs(self._path, exist_ok=True)
        pairs = [p for m in messages for p in m.staged]
        names = [n for _, n in pairs]
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            shutil.rmtree(self._staging(), ignore_errors=True)
            raise ValueError(
                f"binary_files writer: duplicate file names in job: {dupes}"
            )
        # a staged name colliding with a surviving DIRECTORY would fail
        # os.replace mid-commit (half the blobs moved); refuse up front,
        # before any destructive step, in both modes
        dir_clobbers = sorted(
            n for n in set(names) if os.path.isdir(os.path.join(self._path, n))
        )
        if dir_clobbers:
            shutil.rmtree(self._staging(), ignore_errors=True)
            raise ValueError(
                "binary_files writer: file names collide with existing "
                f"subdirectories: {dir_clobbers}"
            )
        if self._overwrite:
            for f in os.listdir(self._path):
                # sweep only plain files: the writer never creates
                # subdirectories, so any directory here is not
                # writer-owned — os.remove on it would raise
                # IsADirectoryError and abort the commit
                fp = os.path.join(self._path, f)
                if not f.startswith("_") and not os.path.isdir(fp):
                    os.remove(fp)
        else:
            existing = {
                f for f in os.listdir(self._path) if not f.startswith("_")
            }
            clobbers = sorted(set(names) & existing)
            if clobbers:
                shutil.rmtree(self._staging(), ignore_errors=True)
                raise ValueError(
                    "binary_files writer: append would clobber existing "
                    f"files: {clobbers}"
                )
        for staged_path, name in pairs:
            os.replace(staged_path, os.path.join(self._path, name))
        shutil.rmtree(self._staging(), ignore_errors=True)
        with open(os.path.join(self._path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


class BinaryFilesDataSource(DataSource):
    """`df.write.format("binary_files").option("path", dir).save()` —
    see `_BinaryFilesWriter`. Write-only: reads go through Spark's
    built-in `binaryFile` source (`readers.read_binary_files`)."""

    @classmethod
    def name(cls):
        return "binary_files"

    def writer(self, schema, overwrite: bool):
        return _BinaryFilesWriter(schema, self.options, overwrite)
