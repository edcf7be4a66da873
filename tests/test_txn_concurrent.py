"""Concurrent-writer conflict gates for the optimistic-CAS commit log
(sources/txn.py) — the one ACID property the rest of the suite asserts
only single-writer: two writers racing on the same version slot must
end with EXACTLY ONE winning that slot, and the loser's retry must
carry the winner's rows forward (no lost update).
"""

from __future__ import annotations

import threading

import pytest

from mql5_economic_news_data_pipeline_2025_gcp__spark.sources import txn


def _rows(spark, lo, n, tag):
    return spark.range(lo, lo + n).selectExpr(
        "id AS k", f"'{tag}' AS src"
    )


def test_forced_cas_conflict_exactly_one_wins(spark, tmp_path):
    """Deterministic interleaving of the append() loop body: both
    writers read the same head and stage the same version; the second
    _try_commit MUST raise, and the loser's retry (the loop's next
    iteration, replayed here verbatim) must base itself on the
    winner's file list."""
    root = str(tmp_path / "t")
    files_a = txn._write_files(_rows(spark, 0, 10, "a"), root)
    files_b = txn._write_files(_rows(spark, 100, 5, "b"), root)

    # both computed v=0 from the same (empty) head
    txn._try_commit(root, 0, {"version": 0, "op": "append", "files": files_a})
    with pytest.raises(txn.CommitConflict):
        txn._try_commit(
            root, 0, {"version": 0, "op": "append", "files": files_b}
        )

    # loser retries: re-reads the NEW head, carries its files forward
    head = txn.versions(root)
    assert head == [0]
    base = txn._read_manifest(root, 0)["files"]
    assert base == files_a
    txn._try_commit(
        root, 1, {"version": 1, "op": "append", "files": base + files_b}
    )

    got = txn.read(spark, root)
    assert got.count() == 15
    assert set(
        r["src"] for r in got.select("src").distinct().collect()
    ) == {"a", "b"}
    # the losing attempt's rows appear exactly once (its staged files
    # were reused by the retry, not rewritten)
    assert txn.read(spark, root).filter("src = 'b'").count() == 5


def test_racing_appends_lose_no_rows(spark, tmp_path):
    """Two threads hammer append() concurrently (the internal retry
    loop resolves the races): every commit must land in a distinct
    version, and the final table must hold every row both writers ever
    wrote — the no-lost-update guarantee under real contention."""
    root = str(tmp_path / "race")
    per_writer = 4
    n_rows = 7
    errs: list[Exception] = []
    versions_won: dict[str, list[int]] = {"a": [], "b": []}
    barrier = threading.Barrier(2)

    def writer(tag: str, lo0: int):
        try:
            barrier.wait(timeout=60)
            for i in range(per_writer):
                df = _rows(spark, lo0 + i * 1000, n_rows, tag)
                versions_won[tag].append(txn.append(df, root))
        except Exception as e:  # surface into the main thread
            errs.append(e)

    ta = threading.Thread(target=writer, args=("a", 0))
    tb = threading.Thread(target=writer, args=("b", 500_000))
    ta.start()
    tb.start()
    ta.join(120)
    tb.join(120)
    assert not errs, errs

    all_versions = versions_won["a"] + versions_won["b"]
    # exactly one commit per slot: 8 appends -> versions 0..7, no dup
    assert sorted(all_versions) == list(range(2 * per_writer))
    assert txn.versions(root) == list(range(2 * per_writer))

    got = txn.read(spark, root)
    assert got.count() == 2 * per_writer * n_rows
    by_src = {
        r["src"]: r["n"]
        for r in got.groupBy("src").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert by_src == {
        "a": per_writer * n_rows,
        "b": per_writer * n_rows,
    }
    # every version's manifest is a superset of its predecessor's
    # (appends only ever add files)
    prev: set[str] = set()
    for v in txn.versions(root):
        cur = set(txn._read_manifest(root, v)["files"])
        assert prev <= cur
        prev = cur
