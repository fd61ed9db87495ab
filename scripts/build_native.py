#!/usr/bin/env python3
"""Eagerly build all native components (they otherwise build lazily on first
use). Equivalent of the reference's per-package ``run_external_build`` /
skbuild machinery (``build_config/accvlab_build_config/helpers``) — here a
single g++ invocation per engine, with no network or package-manager
dependencies.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from accvlab_tpu.hostcopy.native import get_lib as hostcopy_lib
    from accvlab_tpu.video.native import get_lib as video_lib

    ok = True
    lib = hostcopy_lib()
    print(f"hostcopy packer: {'OK' if lib is not None else 'FAILED (numpy fallback)'}")
    ok &= lib is not None
    try:
        video_lib()
        print("video engine: OK")
    except Exception as e:
        print(f"video engine: FAILED ({e})")
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
