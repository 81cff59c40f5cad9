"""protobuf capability shim for the transformWithState parity test.

This container ships no `google.protobuf` wheel, but an authentic
protobuf runtime (6.32.0) is present read-only inside the machine's
google-cloud-sdk install.  When this directory is on PYTHONPATH, Python
imports this module at interpreter start in EVERY process — driver and
the JVM-spawned Python workers alike — and it:

1. does nothing if a real `google.protobuf` is importable (the shim is
   inert outside this container).  "Real" means the module has a
   ``__file__``: Spark workers carry spark-core.jar on sys.path, whose
   bundled ``google/protobuf/*.proto`` RESOURCE directory zipimports as
   a bogus empty namespace package ("unknown location") that would
   otherwise mask the absence; else
2. drops any such namespace ghost from sys.modules, appends the
   sdk-bundled runtime to sys.path, and no-ops its gencode/runtime
   version guard (pyspark 4.1.2 ships 6.33-gencode protos; the 6.32
   runtime parses them fine for the simple StateMessage schema — and
   the parity test that depends on this shim asserts byte-identical
   output against the applyInPandasWithState path, so any actual
   wire-format misbehavior fails the test rather than hiding).

Activated by tests/conftest.py only when needed; nothing in the library
itself depends on it.
"""

import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf() -> bool:
    try:
        import google.protobuf as gp
    except ImportError:
        return False
    return getattr(gp, "__file__", None) is not None


def enable() -> None:
    if _real_protobuf():
        return
    if not os.path.isfile(os.path.join(_SDK, "google", "protobuf", "descriptor.py")):
        return
    # purge namespace ghosts so the re-import scans the extended path
    for name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[name]
    if _SDK not in sys.path:
        sys.path.append(_SDK)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass


enable()
