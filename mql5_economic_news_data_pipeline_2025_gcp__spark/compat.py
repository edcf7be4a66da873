"""Environment compatibility shims.

This container ships no installable ``protobuf`` distribution (no
network, no wheel on disk), but Spark 4's ``transformWithStateInPandas``
Python state server speaks protobuf to the JVM
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``). A usable
pure-Python ``google.protobuf`` runtime DOES exist on this image inside
the Google Cloud SDK's bundled app-engine tooling — ``ensure_protobuf``
discovers it and makes it importable for the driver AND the
JVM-launched Python workers.

Two subtleties:

- The worker processes are spawned by the JVM, which freezes its
  environment at JVM start. ``ensure_protobuf`` must therefore run
  BEFORE ``SparkSession`` creation (``session.get_spark`` calls it
  first) so the exported ``PYTHONPATH`` reaches worker processes.
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

#: On-disk pure-Python protobuf runtimes observed on this image, in
#: preference order (newest runtime first).
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_checked: bool | None = None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, returning whether it is.

    Idempotent; safe to call from any entry point. Mutates ``sys.path``
    and ``os.environ['PYTHONPATH']`` only when a vendored fallback is
    actually used.
    """
    global _checked
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
        # APPEND, never prepend: the vendored dir ships many top-level
        # packages besides google.protobuf; putting it first would shadow
        # same-named site-packages in the driver and every worker.
        # protobuf itself is absent from site-packages (that's why we're
        # here), so tail position still resolves it.
        sys.path.append(cand)
        try:
            importlib.invalidate_caches()
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(cand)
            continue
        # export to JVM-launched python workers (state server et al.)
        pp = os.environ.get("PYTHONPATH", "")
        if cand not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                (pp + os.pathsep if pp else "") + cand
            )
        # vendored runtime may trail pyspark's gencode by a minor
        # version — use protobuf's own documented escape hatch
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
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
    mutable dict — so adding the vendored path THERE reaches workers
    launched from now on, JVM age notwithstanding (verified against the
    transformWithState state server on a stock session)."""
    ok = ensure_protobuf()
    if not ok:
        return False
    env = spark.sparkContext.environment
    pp = os.environ.get("PYTHONPATH", "")
    for cand in _VENDORED_PROTOBUF_DIRS:
        if cand in pp.split(os.pathsep):
            worker_pp = env.get("PYTHONPATH", "")
            if cand not in worker_pp.split(os.pathsep):
                # tail position, matching ensure_protobuf: don't let the
                # vendored dir shadow worker site-packages
                env["PYTHONPATH"] = (
                    worker_pp + os.pathsep if worker_pp else ""
                ) + cand
            env.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
    return True
