"""HiFi-GAN generator tests: shape contract + bit-parity vs an independent
torch implementation through the weight converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.nn.hifigan import HiFiGANGenerator, convert_torch_state_dict

# small config: 2 upsample stages (4, 2), 2 resblock kernels, 2 dilations
SMALL = dict(
    in_channels=8,
    upsample_initial_channel=16,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilations=((1, 3), (1, 3)),
)


def test_generator_shape():
    gen = HiFiGANGenerator(**SMALL)
    mel = jnp.zeros((2, 10, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 10 * 4 * 2)


def _torch_generator(torch):
    """Independent torch HiFi-GAN generator matching SMALL (official module
    naming: conv_pre / ups / resblocks / conv_post, weight-normed)."""
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    class TResBlock(tnn.Module):
        def __init__(self, ch, k, dilations):
            super().__init__()
            self.convs1 = tnn.ModuleList(
                [
                    weight_norm(
                        tnn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) // 2 * d)
                    )
                    for d in dilations
                ]
            )
            self.convs2 = tnn.ModuleList(
                [
                    weight_norm(tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
                    for _ in dilations
                ]
            )

        def forward(self, x):
            import torch.nn.functional as F

            for c1, c2 in zip(self.convs1, self.convs2):
                y = F.leaky_relu(x, 0.1)
                y = c1(y)
                y = F.leaky_relu(y, 0.1)
                y = c2(y)
                x = x + y
            return x

    class TGen(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = SMALL["upsample_initial_channel"]
            self.conv_pre = weight_norm(
                tnn.Conv1d(SMALL["in_channels"], ch, 7, padding=3)
            )
            self.ups = tnn.ModuleList()
            self.resblocks = tnn.ModuleList()
            for u, ku in zip(SMALL["upsample_rates"], SMALL["upsample_kernel_sizes"]):
                self.ups.append(
                    weight_norm(
                        tnn.ConvTranspose1d(
                            ch, ch // 2, ku, stride=u, padding=(ku - u) // 2
                        )
                    )
                )
                ch //= 2
                for k, dil in zip(
                    SMALL["resblock_kernel_sizes"], SMALL["resblock_dilations"]
                ):
                    self.resblocks.append(TResBlock(ch, k, dil))
            self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, padding=3))

        def forward(self, mel):
            import torch
            import torch.nn.functional as F

            x = self.conv_pre(mel)
            nk = len(SMALL["resblock_kernel_sizes"])
            for i, up in enumerate(self.ups):
                x = F.leaky_relu(x, 0.1)
                x = up(x)
                acc = None
                for j in range(nk):
                    y = self.resblocks[i * nk + j](x)
                    acc = y if acc is None else acc + y
                x = acc / nk
            x = F.leaky_relu(x, 0.1)
            return torch.tanh(self.conv_post(x))

    return TGen()


def test_parity_with_torch_through_converter():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    tgen = _torch_generator(torch).eval()
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}

    params = convert_torch_state_dict(sd, n_ups=2, n_kernels=2, n_dilations=2)
    gen = HiFiGANGenerator(**SMALL)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 12, SMALL["in_channels"])).astype(np.float32)
    with torch.no_grad():
        ref = tgen(torch.tensor(mel).permute(0, 2, 1)).numpy()[:, 0, :]
    ours = np.asarray(gen.apply(params, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_converter_handles_fused_weights():
    torch = pytest.importorskip("torch")
    from torch.nn.utils import remove_weight_norm

    torch.manual_seed(1)
    tgen = _torch_generator(torch).eval()
    # fuse weight norm in torch, convert the plain weights
    for m in tgen.modules():
        try:
            remove_weight_norm(m)
        except (ValueError, AttributeError):
            pass
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_torch_state_dict(sd, n_ups=2, n_kernels=2, n_dilations=2)
    gen = HiFiGANGenerator(**SMALL)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 9, SMALL["in_channels"])).astype(np.float32)
    with torch.no_grad():
        ref = tgen(torch.tensor(mel).permute(0, 2, 1)).numpy()[:, 0, :]
    ours = np.asarray(gen.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_size_generator_compiles():
    """Production config: 80 mels → 256× upsampling."""
    gen = HiFiGANGenerator()
    mel = jnp.zeros((1, 20, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = jax.jit(gen.apply)(params, mel)
    assert wav.shape == (1, 20 * 256)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # HiFi-GAN V1 generator ≈ 14M params
    assert 12e6 < n_params < 16e6
