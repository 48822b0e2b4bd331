#!/usr/bin/env python
"""Top-level training shim (reference UX: ``python train.py ...``).

Thin wrapper over ``ir2rgb_tpu.cli.train``; also accepts reference-style
flags (``--name``, ``--dataroot``, ``--batchSize``, ...) and translates
them through the compat table (ir2rgb_tpu/config/compat.py).
"""

import sys


# Reference flags with no analog here, accepted and dropped with a note
# (docs/MIGRATION.md): the device mesh is automatic (--gpu_ids), dtype
# policy is --model.compute_dtype (--data_type/--fp16), TensorBoard is
# always on (--tf_log), HTML galleries are always on (--no_html), and
# jax.distributed discovers the process rank (--local_rank).
# Value = number of CLI tokens the flag consumes after itself
# (reference store_true flags take none).
_IGNORED_REFERENCE_FLAGS = {
    "gpu_ids": 1, "display_winsize": 1, "display_id": 1,
    "display_port": 1, "data_type": 1, "local_rank": 1,
    "tf_log": 0, "verbose": 0, "fp16": 0,
    "no_html": 0, "debug": 0,
    # test-time export flags: the analog is the sealed serving artifact
    # (`ir2rgb-export` -> one .ir2rgb file, StableHLO + weights) — see
    # docs/MIGRATION.md "Serving" and infer/export.py
    "export_onnx": 1, "engine": 1, "onnx": 1,
    # visdom/HTML cadence knobs with no analog (galleries are async +
    # always on); --eval is a no-op here (inference is always eval-mode:
    # InstanceNorm uses per-frame stats, dropout is off at train=False)
    "update_html_freq": 1, "display_single_pane_ncols": 1,
    "display_server": 1, "display_env": 1, "display_ncols": 1,
    "no_display": 0, "eval": 0, "save_by_iter": 0,
    "ntest": 1, "suffix": 1, "epoch_count": 1,
    # The reference's edge channel is ON by default and disabled by
    # --no_instance; on a LAUNCH LINE it stays a no-op here because the
    # absence of --no_instance can't be distinguished from a native-style
    # invocation (our default is off, matching ir2rgb's real-IR launches).
    # opt.txt migration (compat.from_reference_flags) DOES honor the
    # recorded no_instance value — see docs/MIGRATION.md. --label_nc is a
    # real flag (one-hot semantic-label input, model.label_nc), not
    # ignored: it translates through the compat table below.
    "no_instance": 0,
}


def _translate_reference_flags(argv):
    """Map reference-style flags to --section.field form.

    Handles the full compat-table surface (ir2rgb_tpu/config/compat.py):
    value flags are renamed, reference store_true booleans become
    ``--section.field true``, inverted/sentinel flags (--no_lsgan,
    --no_dropout, inf-valued --how_many/--max_dataset_size) are
    rewritten, and no-analog flags are dropped with a stderr note.
    """
    from ir2rgb_tpu.config.compat import REFERENCE_FLAG_TABLE
    out = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        i += 1
        if not tok.startswith("--"):
            out.append(tok)
            continue
        name, eq, inline_val = tok[2:].partition("=")

        def take_value(arity=1):
            nonlocal i
            if eq:
                return inline_val
            if arity == 0:
                return None
            i += 1
            return argv[i - 1] if i - 1 < len(argv) else None

        if name in _IGNORED_REFERENCE_FLAGS:
            take_value(_IGNORED_REFERENCE_FLAGS[name])
            print(f"note: reference flag --{name} has no analog here; "
                  "ignored (docs/MIGRATION.md)", file=sys.stderr)
            continue
        entry = REFERENCE_FLAG_TABLE.get(name)
        if entry is None:
            out.append(tok)  # already --section.field form (or a typo
            continue         # parse_cli will report)
        section, field, conv = entry
        if name == "which_epoch":
            # appears in both the reference's train and test options;
            # route to both sections so `python test.py --which_epoch N`
            # restores the requested epoch (infer reads infer.which_epoch)
            val = take_value()
            out.extend([f"--train.{field}", val, f"--infer.{field}", val])
        elif conv in (None, int, float):
            out.append(f"--{section}.{field}")
            out.append(take_value())
        elif conv is bool:  # reference store_true -> explicit true
            take_value(0)
            out.append(f"--{section}.{field}")
            out.append("true")
        elif name == "no_lsgan":
            take_value(0)
            out.extend(["--loss.gan_mode", "vanilla"])
        elif name == "no_dropout":
            take_value(0)
            out.extend(["--model.use_dropout", "false"])
        elif name in ("how_many", "num_test", "max_dataset_size"):
            val = take_value()
            if val not in (None, "inf"):  # inf == our None default
                out.append(f"--{section}.{field}")
                out.append(val)
        else:  # future lambda entries: pass the raw value through
            out.append(f"--{section}.{field}")
            out.append(take_value())
    return [t for t in out if t is not None]


if __name__ == "__main__":
    from ir2rgb_tpu.cli.train import main
    sys.exit(main(_translate_reference_flags(sys.argv[1:])))
