"""Shared lazy g++ build for the C++ runtime pieces.

Output libraries are keyed on a hash of the source file (not mtime): a fresh
checkout gives every file the same mtime, so an mtime check could load a
stale or wrong-arch binary. A content-hashed filename can never be stale.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from typing import List, Optional


def user_cache_dir() -> str:
    """Per-user 0700 build-cache dir. NEVER a world-shared /tmp path: the
    output name is predictable (content hash of public source), so a shared
    location lets another local user plant a library that ctypes would load."""
    d = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "accvlab_tpu",
        "native",
    )
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


def build_shared_lib(
    src: str,
    stem: str,
    link_args: Optional[List[str]] = None,
) -> str:
    """Compile ``src`` to ``<srcdir>/<stem>-<srchash>.so`` (if not already
    built) and return the library path. Raises RuntimeError on compile error.
    """
    import glob

    from accvlab_tpu.build_config import select_cxx_flags

    flags = select_cxx_flags()
    src_dir = os.path.dirname(os.path.abspath(src))
    h = hashlib.sha256()
    with open(src, "rb") as f:
        h.update(f.read())
    # local headers are part of the content key: a shared csrc header
    # edited without touching the .cpp must still rebuild every library
    # that includes it
    for hdr in sorted(glob.glob(os.path.join(src_dir, "*.h"))):
        with open(hdr, "rb") as f:
            h.update(os.path.basename(hdr).encode())
            h.update(f.read())
    # flag/link changes rebuild too (a stale .so linked without a new
    # dependency would fail only at symbol resolution)
    h.update(" ".join(flags).encode())
    h.update(" ".join(link_args or []).encode())
    digest = h.hexdigest()[:12]
    lib_path = os.path.join(src_dir, f"{stem}-{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    out_dir = src_dir if os.access(src_dir, os.W_OK) else user_cache_dir()
    lib_path = os.path.join(out_dir, f"{stem}-{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp_path = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", *flags, "-shared", "-o", tmp_path, src] + list(link_args or [])
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"{stem} build failed:\n{res.stderr[-2000:]}")
    os.replace(tmp_path, lib_path)  # atomic: concurrent builders race safely
    if out_dir == src_dir:
        # prune ONLY in the per-checkout source dir: a single source file
        # means a single valid hash there. The shared user cache dir may
        # legitimately hold builds from OTHER checkouts/versions — pruning
        # there would ping-pong-delete across venvs and could race another
        # process between its exists() check and dlopen.
        _prune_stale(out_dir, stem, keep=os.path.basename(lib_path))
    return lib_path


def _prune_stale(out_dir: str, stem: str, keep: str):
    """Remove older content-hash builds of ``stem`` after a successful
    rebuild (source edits otherwise accumulate one .so per hash, unbounded).
    A concurrently-running process may hold an old .so open; unlink is safe
    on Linux (the mapping survives until close)."""
    import glob

    for p in glob.glob(os.path.join(out_dir, f"{stem}-*.so")):
        if os.path.basename(p) != keep:
            try:
                os.unlink(p)
            except OSError:
                pass
