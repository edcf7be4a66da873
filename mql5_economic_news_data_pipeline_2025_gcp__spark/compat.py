"""Environment compatibility shims.

This container ships no installable ``protobuf`` distribution (no
network, no wheel on disk), but Spark 4's ``transformWithStateInPandas``
Python state server speaks protobuf to the JVM
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``). A usable
pure-Python ``google.protobuf`` runtime DOES exist on this image inside
the Google Cloud SDK's bundled app-engine tooling — ``ensure_protobuf``
discovers it and makes it importable for the driver AND the
JVM-launched Python workers.

Three subtleties:

- The worker processes are spawned by the JVM, which freezes its
  environment at JVM start. ``ensure_protobuf`` must therefore run
  BEFORE ``SparkSession`` creation (``session.get_spark`` calls it
  first) so the exported ``PYTHONPATH`` reaches worker processes.
- Every ``PYTHONPATH`` entry precedes site-packages in a spawned
  worker's ``sys.path`` NO MATTER where it sits within ``PYTHONPATH``
  (CPython's site initialization appends site-packages after all
  ``PYTHONPATH`` dirs). The app-engine platform dir ships many
  unrelated top-level packages (``lib``, ``demos``, ``api_server``,
  ...), so exporting it whole could shadow worker site-packages
  regardless of position. We therefore export a NARROW shim directory
  containing only a ``google/protobuf`` symlink into the vendored tree
  — nothing else is importable from it (round-11 ADVICE fix).
- PySpark's generated gencode may be a minor version ahead of the
  vendored runtime (6.33.0 gencode vs 6.32.0 runtime here). Protobuf's
  own documented escape hatch
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` skips the strict
  check; same-major wire compatibility is guaranteed by protobuf's
  cross-version runtime guarantee.
"""

from __future__ import annotations

import importlib
import os
import sys
import tempfile

#: On-disk pure-Python protobuf runtimes observed on this image, in
#: preference order (newest runtime first).
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_checked: bool | None = None
#: The directory actually exported to sys.path/PYTHONPATH (the shim).
_exported_dir: str | None = None


def _protobuf_shim_dir(vendored: str) -> str:
    """Build (idempotently) a directory exposing ONLY ``google/protobuf``
    from the vendored tree, via a symlink under a namespace-package
    ``google/`` dir — importable as ``google.protobuf`` while keeping
    every other top-level package of the vendored platform invisible."""
    shim = os.path.join(
        tempfile.gettempdir(), f"spark_graft_pb_shim_{os.getuid()}"
    )
    target = os.path.join(vendored, "google", "protobuf")
    link = os.path.join(shim, "google", "protobuf")
    os.makedirs(os.path.join(shim, "google"), exist_ok=True)
    if not (
        os.path.islink(link)
        and os.path.realpath(link) == os.path.realpath(target)
    ):
        tmp = f"{link}.{os.getpid()}.tmp"  # unique per proc: no race
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)  # atomic swap, survives concurrent setup
    return shim


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, returning whether it is.

    Idempotent; safe to call from any entry point. Mutates ``sys.path``
    and ``os.environ['PYTHONPATH']`` only when a vendored fallback is
    actually used — and then only with the narrow protobuf-only shim
    dir, never the whole vendored platform.
    """
    global _checked, _exported_dir
    if _checked is not None:
        return _checked
    try:
        from google.protobuf import descriptor  # noqa: F401

        _checked = True
        return True
    except ImportError:
        pass
    for cand in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        try:
            shim = _protobuf_shim_dir(cand)
        except OSError:
            continue
        sys.path.append(shim)
        try:
            importlib.invalidate_caches()
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(shim)
            continue
        # export to JVM-launched python workers (state server et al.)
        pp = os.environ.get("PYTHONPATH", "")
        if shim not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                (pp + os.pathsep if pp else "") + shim
            )
        # vendored runtime may trail pyspark's gencode by a minor
        # version — use protobuf's own documented escape hatch
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        _exported_dir = shim
        _checked = True
        return True
    _checked = False
    return False


def ensure_protobuf_for_session(spark) -> bool:
    """``ensure_protobuf`` plus propagation to an ALREADY-RUNNING JVM.

    ``os.environ`` edits only reach Python workers whose JVM launched
    after them; a stock session created before ``ensure_protobuf`` ran
    (the driver harness does exactly this) has a frozen JVM env. But
    worker processes receive their env from the Python function's
    ``envVars`` — populated from ``sparkContext.environment``, a plain
    mutable dict — so adding the shim path THERE reaches workers
    launched from now on, JVM age notwithstanding (verified against the
    transformWithState state server on a stock session)."""
    ok = ensure_protobuf()
    if not ok:
        return False
    if _exported_dir is None:
        return True  # real protobuf on site-packages: nothing to export
    env = spark.sparkContext.environment
    worker_pp = env.get("PYTHONPATH", "")
    if _exported_dir not in worker_pp.split(os.pathsep):
        env["PYTHONPATH"] = (
            worker_pp + os.pathsep if worker_pp else ""
        ) + _exported_dir
    env.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    return True
