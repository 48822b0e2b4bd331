"""Reverse-migration tests: params trained in THIS framework must load
and run in the reference's torch stack (checkpoint/torch_export.py — the
importer's mirror, SURVEY.md §3.4).

Two directions are proven:
- exact round-trip: torch sd -> import -> export fills an identical sd
  (the layout conversions are lossless inverses);
- deploy-back: OUR randomly-initialized params exported into a template,
  loaded strict into the torch module, same outputs both stacks.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ir2rgb_tpu.checkpoint import (
    export_discriminator,
    export_generator,
    import_discriminator,
    import_generator,
)
from ir2rgb_tpu.nn import DiscConfig, GenConfig, define_d, define_g

import torch_refs

torch.backends.mkldnn.enabled = False


def _sd(model):
    from collections import OrderedDict
    return OrderedDict((k, v.detach().numpy())
                       for k, v in model.state_dict().items())


def _assert_sd_equal(exported, original):
    assert list(exported) == list(original)
    for k in original:
        np.testing.assert_allclose(
            exported[k], original[k], atol=0, rtol=0,
            err_msg=f"round-trip mismatch at {k}")


# ---------------------------------------------------------------------------
# Exact round-trip: import -> export reproduces the torch sd bit-for-bit
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_resnet_roundtrip(norm):
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=3, norm=norm)
    cfg = GenConfig(net_g="resnet_9blocks", ngf=8, norm=norm)
    sd = _sd(t)
    params = import_generator(sd, cfg, n_blocks=3)
    out = export_generator(params, cfg, sd, n_blocks=3)
    _assert_sd_equal(out, sd)


def test_unet_roundtrip():
    t = torch_refs.UnetGenerator(num_downs=8, ngf=4)
    cfg = GenConfig(net_g="unet_256", ngf=4)
    sd = _sd(t)
    params = import_generator(sd, cfg)
    _assert_sd_equal(export_generator(params, cfg, sd), sd)


def test_local_enhancer_roundtrip():
    t = torch_refs.LocalEnhancer(ngf=4, n_downsample_global=2,
                                 n_blocks_global=2, n_blocks_local=2)
    cfg = GenConfig(net_g="local", ngf=4, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=2,
                    n_local_enhancers=1)
    sd = _sd(t)
    params = import_generator(sd, cfg)
    _assert_sd_equal(export_generator(params, cfg, sd), sd)


def test_multiscale_d_roundtrip():
    t = torch_refs.MultiscaleDiscriminator(input_nc=6, ndf=8, num_d=2,
                                           get_interm_feat=True)
    cfg = DiscConfig(net_d="multiscale", ndf=8, num_d=2, input_nc=6)
    sd = _sd(t)
    params = import_discriminator(sd, cfg)
    _assert_sd_equal(export_discriminator(params, cfg, sd), sd)


# ---------------------------------------------------------------------------
# Deploy-back: OUR params -> torch module, outputs match
# ---------------------------------------------------------------------------

def test_our_params_deploy_into_torch_resnet():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, norm="instance")
    init, apply = define_g(cfg)
    params = init(jax.random.PRNGKey(3))

    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    out_sd = export_generator(params, cfg, _sd(t))
    missing, unexpected = t.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in out_sd.items()},
        strict=True)
    assert not missing and not unexpected
    t.eval()

    torch.manual_seed(0)
    x_t = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_t = t(x_t).numpy()
    y_j = np.asarray(apply(
        params, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        y_j.transpose(0, 3, 1, 2), y_t, atol=1e-4)


def test_our_params_deploy_into_torch_local_enhancer():
    cfg = GenConfig(net_g="local", ngf=4, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=2,
                    n_local_enhancers=1)
    init, apply = define_g(cfg)
    params = init(jax.random.PRNGKey(5))

    t = torch_refs.LocalEnhancer(ngf=4, n_downsample_global=2,
                                 n_blocks_global=2, n_blocks_local=2)
    out_sd = export_generator(params, cfg, _sd(t))
    t.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in out_sd.items()},
        strict=True)
    t.eval()

    torch.manual_seed(1)
    x_t = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        y_t = t(x_t).numpy()
    y_j = np.asarray(apply(
        params, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        y_j.transpose(0, 3, 1, 2), y_t, atol=1e-4)


def test_export_shape_mismatch_is_loud():
    """Wrong-width template must fail at the offending entry, not write
    a silently wrong checkpoint."""
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, norm="instance")
    init, _ = define_g(cfg)
    params = init(jax.random.PRNGKey(0))
    t16 = torch_refs.ResnetGenerator(ngf=16, n_blocks=6, norm="instance")
    with pytest.raises(ValueError, match="shape mismatch"):
        export_generator(params, cfg, _sd(t16))


def test_export_save_and_torch_load(tmp_path):
    """save_torch_state_dict writes a plain .pth the reference stack
    (torch.load + load_state_dict) accepts."""
    from ir2rgb_tpu.checkpoint import save_torch_state_dict
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, norm="instance")
    init, _ = define_g(cfg)
    params = init(jax.random.PRNGKey(7))
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    out_sd = export_generator(params, cfg, _sd(t))
    path = str(tmp_path / "exported_net_G.pth")
    save_torch_state_dict(out_sd, path)
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    t.load_state_dict(loaded, strict=True)


def test_export_norm_type_mismatch_is_loud():
    """Instance-norm params into a batch-norm template must fail (the
    silent path would drop conv biases and write BN init stats)."""
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, norm="instance")
    init, _ = define_g(cfg)
    params = init(jax.random.PRNGKey(0))
    t_bn = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="batch")
    with pytest.raises(ValueError, match="norm count mismatch"):
        export_generator(params, cfg, _sd(t_bn))
