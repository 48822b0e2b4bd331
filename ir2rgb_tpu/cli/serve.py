"""ir2rgb-serve — long-lived network serving daemon.

The production counterpart of ``test.py`` (SURVEY.md §3.2 serves a frame
folder and exits): load generator weights once, compile ONE batched step
for N slots, then translate frames arriving over TCP from up to N
concurrent clients, each with its own temporal carry. Protocol + client
in ``infer/server.py``.

    ir2rgb-serve --preset temporal_512 --train.name run1 \\
        --infer.serve_port 7788 --infer.serve_slots 8 \\
        [--infer.quant int8] [--infer.use_ema] [--torch_g G.pth] \\
        [--serve.hw 512x512]

Frame geometry defaults to ``--data.crop_size`` square; override with
``--serve.hw HxW`` for non-square streams.
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    from ir2rgb_tpu.cli.common import load_generator_params, pop_flag
    from ir2rgb_tpu.config import parse_cli
    from ir2rgb_tpu.infer.multistream import MultiStreamServer
    from ir2rgb_tpu.infer.server import FrameServer
    from ir2rgb_tpu.train import create_model

    argv = list(sys.argv[1:] if argv is None else argv)
    torch_g = pop_flag(argv, "--torch_g")
    artifact = pop_flag(argv, "--artifact")
    hw_flag = pop_flag(argv, "--serve.hw")
    # the config default (8) must not silently cap a sealed artifact
    # with more slots — only an EXPLICIT flag caps (see below)
    slots_explicit = any(a.split("=", 1)[0] == "--infer.serve_slots"
                         for a in argv)
    cfg = parse_cli(argv)

    if artifact is not None:
        # sealed multi-stream .ir2rgb (ir2rgb-export --slots N): no
        # model code, no trace at daemon start. Geometry, slot count
        # and quantization are baked into the program — flags that
        # would silently not apply are refused.
        if torch_g is not None:
            raise SystemExit("--artifact and --torch_g are mutually "
                             "exclusive (the artifact seals its weights)")
        if cfg.infer.quant != "none":
            raise SystemExit(
                "--infer.quant has no effect on a sealed artifact "
                "(quantization is baked at export: ir2rgb-export "
                "--infer.quant int8 --slots N)")
        if hw_flag:
            raise SystemExit("--serve.hw has no effect on a sealed "
                             "artifact (geometry is baked at export)")
        if cfg.infer.use_ema:
            raise SystemExit("--infer.use_ema has no effect on a sealed "
                             "artifact (export the EMA weights instead)")
        if cfg.infer.which_epoch != "latest":
            raise SystemExit("--infer.which_epoch has no effect on a "
                             "sealed artifact (it has no checkpoint "
                             "directory; export the epoch you want)")
        # an explicit --infer.serve_slots caps attachable streams below
        # the sealed physical batch (a cap above it just serves every
        # sealed slot, via clamp); unset serves every sealed slot
        srv = MultiStreamServer.from_artifact(
            artifact,
            n_slots=cfg.infer.serve_slots if slots_explicit else None,
            clamp=True)
        h, w = srv.frame_hw
        label = f"artifact {os.path.basename(artifact)}"
    else:
        if hw_flag:
            try:
                h, w = (int(v) for v in hw_flag.lower().split("x"))
            except ValueError:
                raise SystemExit(f"--serve.hw expects HxW (e.g. "
                                 f"512x512), got {hw_flag!r}")
        else:
            h = w = cfg.data.crop_size

        model = create_model(cfg, steps_per_epoch=1)
        g_params = load_generator_params(cfg, model, torch_g)
        # cfg.infer.quant rides the model instance (nn/quant.py)
        srv = MultiStreamServer(model, g_params, (h, w),
                                n_slots=cfg.infer.serve_slots)
        label = f"{cfg.model.model}/{cfg.model.net_g}"

    fs = FrameServer(srv, host=cfg.infer.serve_host,
                     port=cfg.infer.serve_port,
                     encode=cfg.infer.serve_encode,
                     quality=cfg.infer.serve_quality,
                     tick_ms=cfg.infer.serve_tick_ms,
                     max_pending=cfg.infer.serve_max_pending)
    fs.start()  # resolves an ephemeral port before the banner
    print(f"serving {label} at "
          f"{fs.host}:{fs.port}  frame {h}x{w}x{srv.in_nc} -> "
          f"{fs.out_nc}ch  slots {srv.n_slots} "
          f"(physical {srv.physical_slots})  encode {fs.encode}",
          flush=True)
    fs.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
