"""Activation for the vendored minimal protobuf runtime shim.

PySpark's transformWithState python↔state-server protocol imports
``google.protobuf`` (via the generated ``StateMessage_pb2``).  Where the
real wheel is installed it is always used; in environments without it
(this container has no network route to PyPI) ``ensure_protobuf``
exposes ``_vendor/protoshim`` — a pure-Python implementation of exactly
the proto3 wire subset that protocol uses (see
``_vendor/protoshim/google/protobuf/_shim_engine.py`` for the loud
limits).

Call it BEFORE the SparkSession / JVM starts: the state-protocol client
runs inside Python *worker* processes, which inherit ``PYTHONPATH`` from
the driver's environment at JVM launch.
"""

from __future__ import annotations

import os
import sys


def ensure_protobuf() -> bool:
    """Make ``import google.protobuf`` work, preferring the real wheel.

    Returns True if the shim was activated, False if a real protobuf
    runtime is already importable."""
    try:
        import google.protobuf  # noqa: F401

        return False
    except ImportError:
        pass
    # The shim's google/ directory is a PEP 420 namespace package (NO
    # __init__.py) and the path is APPENDED, not prepended: in an
    # environment carrying other google.* namespace portions
    # (google.auth, google.cloud) but no protobuf wheel, a regular
    # package here would terminate namespace-path resolution and break
    # those imports, and a prepended entry would shadow site-packages
    # for every module, not just the one we vendor (ADVICE r11).
    shim = os.path.join(os.path.dirname(__file__), "_vendor", "protoshim")
    if shim not in sys.path:
        sys.path.append(shim)
    existing = os.environ.get("PYTHONPATH", "")
    if shim not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            existing + os.pathsep + shim if existing else shim
        )
    return True
