"""Optional C fast path for the extraction hot loop.

``get_parse_doc()`` returns the compiled ``se_native.parse_doc`` (building
it with the system compiler on first use when possible) or ``None``, in
which case callers fall back to the pure-Python path — the semantics
source of truth either way (see fastparse.c header).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "fastparse.c"
_SO = _DIR / f"se_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}"

_parse_doc = None
_tried = False


def _build() -> bool:
    """Compile fastparse.c, then atomically rename into place; returns True
    on success.  No pip, no setuptools — one gcc invocation against the
    CPython headers.

    The temp-file + os.rename dance matters under concurrency: executor
    processes all target the same .so path, and gcc rewriting a file another
    process has already dlopen'd can SIGBUS that process.  rename() is
    atomic on the same filesystem, so readers only ever see a complete
    module (old or new)."""
    cc = os.environ.get("CC", "gcc")
    inc = sysconfig.get_paths()["include"]
    tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.tmp")
    cmd = [cc, "-O2", "-fPIC", "-shared", f"-I{inc}",
           str(_SRC), "-o", str(tmp)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0 or not tmp.exists():
            return False
        os.rename(tmp, _SO)
        return True
    except Exception:
        return False
    finally:
        tmp.unlink(missing_ok=True)


def get_parse_doc():
    """parse_doc(html: bytes) -> extraction tuple, or None if the native
    module is unavailable (no compiler / unsupported platform)."""
    global _parse_doc, _tried
    if _parse_doc is not None or _tried:
        return _parse_doc
    _tried = True
    if os.environ.get("SPARK_GRAFT_NO_NATIVE"):
        return None
    try:
        # zipimported deployments (spark-submit --py-files zip) have no
        # real directory to build into: stat() raises → pure-Python path.
        # Ship the prebuilt .so via --files/--archives to enable it there.
        src_mtime = _SRC.stat().st_mtime
        if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
            if not _build():
                return None
        sys.path.insert(0, str(_DIR))
        try:
            import se_native  # noqa: F401  (built above)
        finally:
            sys.path.remove(str(_DIR))
        from search_engine_spark.functions.stemmer import stem

        se_native.init(stem)
        _parse_doc = se_native.parse_doc
    except Exception:
        _parse_doc = None
    return _parse_doc
