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


def test_reader_pinned_during_optimize_sees_old_snapshot(spark, tmp_path):
    """Snapshot isolation across OPTIMIZE (round-11 stretch task): a
    reader that resolved version N keeps reading N's exact row set —
    and N's exact FILE set — while optimize_files() commits N+1 packed
    files underneath it. Data files are immutable and optimize never
    deletes (only vacuum can), so the pinned frame collects identically
    after the swap; time travel to N agrees; and the new head holds the
    same rows from a different (smaller) file list."""
    root = str(tmp_path / "opt")
    txn.overwrite(_rows(spark, 0, 10, "base").coalesce(1), root)
    for i in range(3):  # three small streaming-style appends
        txn.append(_rows(spark, 1000 * (i + 1), 5, f"a{i}").coalesce(1), root)
    n_pin = txn.versions(root)[-1]
    pin_files = set(txn._read_manifest(root, n_pin)["files"])
    pinned = txn.read(spark, root, version=n_pin)  # resolves N's files NOW
    expected = {(r["k"], r["src"]) for r in pinned.collect()}
    assert len(expected) == 25

    v_new, n_packed, _carried = txn.optimize_files(
        spark, root, target_file_mb=128
    )
    assert v_new == n_pin + 1 and n_packed >= 2

    # the pinned reader still sees N's rows exactly, collected AFTER
    # the OPTIMIZE commit swapped the head
    assert {(r["k"], r["src"]) for r in pinned.collect()} == expected
    # time travel to N re-resolves the same immutable file list
    assert set(txn._read_manifest(root, n_pin)["files"]) == pin_files
    assert {
        (r["k"], r["src"])
        for r in txn.read(spark, root, version=n_pin).collect()
    } == expected
    # new head: same rows, different (packed) files
    head_files = set(txn._read_manifest(root, v_new)["files"])
    assert head_files != pin_files and len(head_files) < len(pin_files)
    assert {
        (r["k"], r["src"]) for r in txn.read(spark, root).collect()
    } == expected
    # every pre-OPTIMIZE data file still exists (only vacuum deletes)
    for f in pin_files:
        assert (tmp_path / "opt" / f).exists()
