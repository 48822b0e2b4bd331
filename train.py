#!/usr/bin/env python
"""Top-level training shim (reference UX: ``python train.py ...``).

Thin wrapper over ``ir2rgb_tpu.cli.train``; also accepts reference-style
flags (``--name``, ``--dataroot``, ``--batchSize``, ...) and translates
them through the compat table (ir2rgb_tpu/config/compat.py).
"""

import sys


def _translate_reference_flags(argv):
    """Map reference-style flags to --section.field form where possible."""
    from ir2rgb_tpu.config.compat import REFERENCE_FLAG_TABLE
    out = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--"):
            name = tok[2:].split("=")[0]
            entry = REFERENCE_FLAG_TABLE.get(name)
            if entry is not None and entry[2] in (None, int, float):
                section, field, _ = entry
                if "=" in tok:
                    out.append(f"--{section}.{field}=" + tok.split("=", 1)[1])
                else:
                    out.append(f"--{section}.{field}")
            else:
                out.append(tok)
        else:
            out.append(tok)
        i += 1
    return out


if __name__ == "__main__":
    from ir2rgb_tpu.cli.train import main
    sys.exit(main(_translate_reference_flags(sys.argv[1:])))
