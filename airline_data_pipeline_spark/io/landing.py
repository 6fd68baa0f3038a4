"""Remote-file landing step (SURVEY.md §2.1 op S3).

The reference downloads CSVs from SFTP with paramiko (with a mock
fallback) and validates each file before processing
(`data_ingestion/ingest.py:161-288`). Spark has no native SFTP source,
and at 100 TB the right design is the same one the reference gestures
at: land remote files into shared/object storage *ahead of* the Spark
scan, then `spark.read` the landing directory. This module is that thin
landing step — deliberately driver-side Python, not a DataSource V2
(the listing is metadata-scale, the copy is IO-bound, and object-store
landing replaces SFTP entirely on a real cluster).

paramiko isn't in this container, so the real client is gated behind an
import-try and a deterministic mock client stands in (mirrors the
reference's `MockSFTPClient`, `ingest.py:161-174`).
"""

from __future__ import annotations

import csv
import io
import os
from dataclasses import dataclass, field


@dataclass
class LandingResult:
    landed: list[str] = field(default_factory=list)
    rejected: dict[str, str] = field(default_factory=dict)


class MockRemoteClient:
    """Deterministic stand-in for an SFTP client (testing / no-network).

    Mirrors the behavior (not the code) of the reference's mock:
    a fixed listing with small inline payloads.
    """

    def __init__(self, files: dict[str, bytes] | None = None) -> None:
        self._files = files if files is not None else {
            "flight_data.csv": (
                b"FL_DATE,OP_CARRIER,OP_CARRIER_FL_NUM,ORIGIN,DEST,"
                b"CRS_DEP_TIME,DEP_TIME,CRS_ARR_TIME,ARR_TIME\n"
                b"1/1/2024 12:00:00 AM,AA,100,JFK,LAX,900,905.0,1200,1158.0\n"
                b"1/1/2024 12:00:00 AM,DL,200,sfo,ord,1000,,1300,\n"
            ),
            "weather_data.json": (
                b'{"stations": [{"id": "JFK", "temperature": 72, '
                b'"conditions": "clear"}]}'
            ),
        }

    def listdir(self, _path: str = ".") -> list[str]:
        return sorted(self._files)

    def get(self, remote: str, local: str) -> None:
        with open(local, "wb") as f:
            f.write(self._files[remote])


def connect_sftp(host: str, port: int, username: str, password: str):
    """Real SFTP client if paramiko is available, else raises.

    Production path only; tests and this container use MockRemoteClient.
    """
    try:
        import paramiko  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - container has no paramiko
        raise RuntimeError(
            "paramiko not installed; use MockRemoteClient or land files "
            "into object storage upstream"
        ) from e
    transport = paramiko.Transport((host, port))  # pragma: no cover
    transport.connect(username=username, password=password)  # pragma: no cover
    return paramiko.SFTPClient.from_transport(transport)  # pragma: no cover


def validate_landed_file(path: str, required_columns: list[str] | None = None) -> tuple[bool, str]:
    """File-level content validation before the Spark scan.

    Same contract as the reference's `validate_file_content`
    (`ingest.py:63-114`): CSV must parse, be non-empty, and contain the
    required columns; JSON must parse to a dict/list. Runs driver-side
    on the landing copy — a malformed file never reaches the cluster.
    """
    if path.endswith(".csv"):
        try:
            with open(path, newline="") as f:
                reader = csv.reader(f)
                header = next(reader, None)
                if header is None:
                    return False, "empty CSV"
                first_row = next(reader, None)
                if first_row is None:
                    return False, "CSV has header but no rows"
        except (csv.Error, UnicodeDecodeError) as e:
            return False, f"CSV parse error: {e}"
        if required_columns:
            missing = sorted(set(required_columns) - set(header))
            if missing:
                return False, f"missing required columns: {missing}"
        return True, "ok"
    if path.endswith(".json"):
        import json

        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            return False, f"JSON parse error: {e}"
        if not isinstance(doc, (dict, list)):
            return False, "JSON top level must be object or array"
        return True, "ok"
    return False, f"unsupported file type: {path}"


def land_files(
    client,
    landing_dir: str,
    required_columns: list[str] | None = None,
    on_failure=None,
) -> LandingResult:
    """Copy every remote file into the landing dir, validating each.

    Valid files stay; invalid files are quarantined with a reason.
    The reference alerts via SMTP on ingest failure (`ingest.py:34-61`);
    here alerting is a pluggable ``on_failure(rejected: dict[str, str])``
    callback invoked once if anything was rejected — wire an SMTP/pager
    sender in production, leave None to let the caller inspect
    `rejected` directly.
    """
    os.makedirs(landing_dir, exist_ok=True)
    result = LandingResult()
    for name in client.listdir("."):
        local = os.path.join(landing_dir, name)
        client.get(name, local)
        ok, msg = validate_landed_file(local, required_columns if name.endswith(".csv") else None)
        if ok:
            result.landed.append(local)
        else:
            result.rejected[local] = msg
            os.replace(local, local + ".rejected")
    if result.rejected and on_failure is not None:
        on_failure(dict(result.rejected))
    return result
