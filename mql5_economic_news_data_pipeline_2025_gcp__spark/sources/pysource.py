"""Custom connector via the PySpark 4 Python Data Source API — the
extension point for reading in-house formats/feeds without a JVM
connector (SPARK-44076 surface: ``DataSource`` / ``DataSourceReader`` /
``InputPartition``, registered with ``spark.dataSource.register``).

The shipped source is a deterministic synthetic-events generator:
every row is a pure function of its row id (md5 arithmetic), so the
SAME rows are reproducible from any engine — which is what makes a
custom connector differentially testable (the DuckDB oracle re-derives
the rows from ``range()``; see ``plans.queries_r5.src_pydatasource_agg``).

Connector mechanics demonstrated, in the order a real one needs them:

- **Partition planning**: ``partitions()`` returns ``n_parts`` splits;
  each executor task reads only its stride — the parallelism contract
  (a real connector would return file chunks / shard tokens here).
- **Per-partition iteration**: ``read(partition)`` yields tuples lazily
  — rows stream through Arrow into the JVM, nothing materializes
  driver-side.
- **Options**: ``n_rows`` / ``n_parts`` arrive via
  ``.option(...)`` exactly as for built-in sources.

At 100 TB the equivalent source points partitions at real shards;
everything downstream (pushdown of the later DataFrame ops, AQE over
the scan's output) is unchanged — the Python seam is per-batch, not
per-row, and ends at the scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ["view", "click", "purchase", "signup"]


def _make_row(i: int):
    import hashlib

    h = hashlib.md5(str(i).encode()).hexdigest()
    return (
        i,
        int(h[:4], 16) % 100,
        EVENT_TYPES[int(h[4], 16) % 4],
        int(h[5:12], 16) % 1000000,
    )


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — deterministic generator source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "value_c bigint"
        )

    def reader(self, schema):
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticStreamReader(self.options)


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        start = partition.value
        for i in range(start, self.n_rows, self.n_parts):
            yield _make_row(i)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (micro-batch offsets): each
    trigger emits the next ``batch_rows`` ids until ``max_rows``; the
    offset is a plain dict the engine checkpoints, and
    ``readBetweenOffsets`` replays any committed range byte-identically
    — which is what makes a failed micro-batch recoverable. When the
    offset stops advancing, Trigger.AvailableNow drains cleanly."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        s = start["next"]
        e = min(s + self.batch_rows, self.max_rows)
        return iter([_make_row(i) for i in range(s, e)]), {"next": e}

    def readBetweenOffsets(self, start, end):
        return iter([_make_row(i) for i in range(start["next"], end["next"])])


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


def read_synthetic_events(spark, n_rows: int = 10000, n_parts: int = 8):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", str(n_rows))
        .option("n_parts", str(n_parts))
        .load()
    )


# ------------------------------------------------------------- write path
# The WRITE half of the Python Data Source API (SPARK-44076): a real
# in-house connector needs both directions. The shipped sink writes
# JSONL part files with a two-phase commit — executors write
# task-attempt files and return commit messages; the driver's commit()
# publishes a _MANIFEST naming exactly the committed parts (readers
# ignore orphans from failed attempts), abort() removes them. That is
# the same manifest-pinning discipline as sources/txn.py, demonstrated
# at the connector seam.


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    and the STREAMING half:
    ``df.writeStream.format("jsonl_sink").option("path", dir)...`` via
    :class:`_JsonlStreamWriter` (per-micro-batch two-phase commit)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlStreamWriter(self.options, schema)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self._fields = [f.name for f in schema.fields]
        self._overwrite = overwrite

    # executor side: one task-attempt file per partition
    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self._path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self._path, fname), "w") as fh:
            for row in iterator:
                rec = {k: _json_safe(v) for k, v in zip(self._fields, row)}
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    # driver side: publish EXACTLY the committed parts
    def commit(self, messages):
        import glob
        import json
        import os

        rows_per_part = {m.filename: m.n_rows for m in messages}
        manifest_path = os.path.join(self._path, "_MANIFEST")
        if self._overwrite:
            # overwrite semantics: this save is the whole dataset — prune
            # every part file not written by this job, so a glob reader
            # (part-*.jsonl) can't see stale rows from a prior save
            for stale in glob.glob(os.path.join(self._path, "part-*.jsonl")):
                if os.path.basename(stale) not in rows_per_part:
                    try:
                        os.remove(stale)
                    except OSError:
                        pass
        elif os.path.exists(manifest_path):
            # append semantics: the new manifest must keep naming the
            # prior save's committed parts or they become orphans
            try:
                with open(manifest_path) as fh:
                    prior = json.load(fh).get("rows_per_part", {})
                for fname, n in prior.items():
                    rows_per_part.setdefault(fname, n)
            except (OSError, ValueError):
                pass
        manifest = {
            "parts": sorted(rows_per_part),
            "rows_per_part": rows_per_part,
            "rows": sum(rows_per_part.values()),
        }
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)

    def abort(self, messages):
        import os

        # a failed task contributes None (no commit message was returned);
        # only successful attempts left files to clean up
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.filename))
            except OSError:
                pass


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming sink leg of the connector: one two-phase commit PER
    MICRO-BATCH. Executors write task-attempt part files and return
    commit messages; the driver's ``commit(messages, batchId)``
    publishes ``_BATCH_<id>`` naming exactly that batch's committed
    parts. Exactly-once across engine restarts comes from batch-id
    idempotence: a REPLAYED batch (the engine re-runs the last batch
    after an un-acked commit) finds its ``_BATCH_<id>`` already
    published, discards the replay attempt's duplicate part files and
    leaves the original commit untouched — the same dedup-by-batch-id
    discipline as ``txn.append_exactly_once``. A committed reader takes
    the union of parts named by batch manifests and sees no orphan from
    failed attempts or replays."""

    def __init__(self, options, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self._fields = [f.name for f in schema.fields]

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self._path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self._path, fname), "w") as fh:
            for row in iterator:
                rec = {
                    k: _json_safe(v) for k, v in zip(self._fields, row)
                }
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def _batch_manifest(self, batch_id: int) -> str:
        import os

        return os.path.join(self._path, f"_BATCH_{batch_id}")

    def commit(self, messages, batchId: int):
        import json
        import os

        live = [m for m in messages if m is not None]
        manifest_path = self._batch_manifest(batchId)
        if os.path.exists(manifest_path):
            # replayed batch: the original commit already published —
            # drop this attempt's duplicate parts (exactly-once)
            for m in live:
                try:
                    os.remove(os.path.join(self._path, m.filename))
                except OSError:
                    pass
            return
        manifest = {
            "batch_id": batchId,
            "parts": sorted(m.filename for m in live),
            "rows": sum(m.n_rows for m in live),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, manifest_path)  # atomic publish

    def abort(self, messages, batchId: int):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.filename))
            except OSError:
                pass


def committed_stream_rows(path: str) -> dict:
    """Reader-side contract for the streaming sink: the committed
    dataset is the union of parts named by ``_BATCH_*`` manifests —
    orphans from failed attempts or discarded replays are invisible."""
    import glob
    import json
    import os

    parts: list[str] = []
    rows = 0
    for mp in sorted(glob.glob(os.path.join(path, "_BATCH_*"))):
        if mp.endswith(".tmp"):
            continue
        with open(mp) as fh:
            man = json.load(fh)
        parts.extend(man["parts"])
        rows += man["rows"]
    return {"parts": parts, "rows": rows}


def _json_safe(v):
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
