#!/usr/bin/env python
"""Top-level inference shim (reference UX: ``python test.py ...``)."""

import sys

if __name__ == "__main__":
    from ir2rgb_tpu.cli.infer import main
    from train import _translate_reference_flags
    sys.exit(main(_translate_reference_flags(sys.argv[1:])))
