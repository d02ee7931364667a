"""Custom Python DataSource WRITER (Spark 4 API): manifest-committed
JSON-lines sink.

The write-side complement of sources/synthetic.py's reader: the same
extensibility path a production build would use to push DataFrames into
an internal record service. What it demonstrates is the COMMIT PROTOCOL,
which is the part that matters at 100 TB:

- each task writes its partition to a UNIQUELY-NAMED part file
  (``part-<partitionId>-<taskId>.jsonl``) — task retries and speculative
  duplicates never collide, they write different files;
- each successful task returns a :class:`WriterCommitMessage` carrying
  the file name and row count; Spark delivers messages ONLY from the one
  winning attempt per partition;
- the driver-side ``commit`` writes a ``_MANIFEST.json`` listing exactly
  the committed files — readers that go through the manifest never see
  orphan output from failed/zombie attempts (the same idea as Hadoop
  commit protocols / Iceberg snapshot manifests, in miniature);
- ``abort`` leaves no manifest, so a failed job is invisible.

Registered as ``jsonl_manifest``; tests/test_jsonl_sink.py round-trips a
write and asserts manifest-vs-directory consistency and atomicity.

Reference: the reference's sink is a single in-process TSV print
(client.go:66-71); this is the distributed, retry-safe generalization.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest requires a 'path' option")

    def write(self, iterator) -> _FileCommit:  # executor-side, per task
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        # attempt-unique name: retries/speculation write distinct files
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
                f.write("\n")
                n += 1
        return _FileCommit(filename=fname, n_rows=n)

    def commit(self, messages) -> None:  # driver-side, exactly once
        files = [
            {"filename": m.filename, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        manifest = {
            "files": sorted(files, key=lambda d: d["filename"]),
            "n_rows": sum(d["n_rows"] for d in files),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)

    def abort(self, messages) -> None:
        # no manifest -> the output is invisible to manifest readers;
        # orphan part files are garbage-collectable by name pattern
        pass


class JsonlManifestSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlManifestWriter(self.options)
