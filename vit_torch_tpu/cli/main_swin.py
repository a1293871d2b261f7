"""Swin classification CLI twin.

The reference keeps a flat-script twin of main.py for Swin runs
(``main_swin.py``, using ``return_separate=lineareval`` to split
backbone/head ``:93-112``).  In this framework the main CLI already handles
every family uniformly — this entry point just defaults the arch to a Swin
config and delegates, preserving the reference's command surface:

    python -m vit_torch_tpu.cli.main_swin --arch swin_base_patch4_window7_224 ...
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

from vit_torch_tpu.cli.main import main as _main


def main(argv: Optional[Sequence[str]] = None) -> object:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--arch" not in argv:
        argv = ["--arch", "swin_base_patch4_window7_224"] + argv
    return _main(argv)


if __name__ == "__main__":
    main()
