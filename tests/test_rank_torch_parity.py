"""RankModel numerical parity vs an independent PyTorch implementation.

Builds the published architecture in torch (MHA + conv-FFN transformer with
post-norm, emotion embedding added after the stack, masked mean pooling,
bias-free rank projector), converts its weights with
emotts.nn.convert.rank_params_from_torch, and checks outputs AND the total
loss match — the fixed-seed loss-parity gate of BASELINE config 2.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emotts.losses import rank_loss  # noqa: E402
from emotts.nn import RankModel  # noqa: E402
from emotts.nn.convert import rank_params_from_torch  # noqa: E402

# EMOTTS_PARITY_FULL=1 runs the same gates at PRODUCTION dims (config
# defaults: H=384, 6 layers, k=9, 80-mel/82-ch input) via
# tools/full_size_parity.py; the default suite stays at toy dims
import json  # noqa: E402
import os  # noqa: E402

_FULL = os.environ.get("EMOTTS_PARITY_FULL") == "1"
if _FULL:
    H, HEADS, LAYERS, KERNEL, N_MELS, N_EMO = 384, 2, 6, 9, 80, 5
    B, T = 3, 160
    MULT = 4  # conv-FFN expansion: hidden*4 = 1536 at production dims
else:
    H, HEADS, LAYERS, KERNEL, N_MELS, N_EMO = 32, 2, 2, 9, 14, 3
    B, T = 3, 20
    MULT = 2


def _record(test: str, **vals) -> None:
    out = os.environ.get("EMOTTS_PARITY_OUT")
    if out:
        with open(out, "a") as f:
            f.write(json.dumps({"test": test, "full": _FULL, **vals}) + "\n")


class TLayer(tnn.Module):
    """Independent torch encoder layer matching the published block: MHA →
    post-norm → conv(k)→GELU→conv(k) → post-norm, dropout omitted (eval)."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(H, HEADS, batch_first=True)
        self.conv1 = tnn.Conv1d(H, H * MULT, KERNEL, padding=KERNEL // 2)
        self.conv2 = tnn.Conv1d(H * MULT, H, KERNEL, padding=KERNEL // 2)
        self.norm1 = tnn.LayerNorm(H)
        self.norm2 = tnn.LayerNorm(H)

    def forward(self, x, key_padding_mask):
        a, _ = self.self_attn(x, x, x, key_padding_mask=key_padding_mask)
        x = self.norm1(x + a)
        y = self.conv2(F.gelu(self.conv1(x.transpose(1, 2)))).transpose(1, 2)
        return self.norm2(x + y)


class TRank(tnn.Module):
    def __init__(self):
        super().__init__()

        class Ext(tnn.Module):
            def __init__(self):
                super().__init__()
                self.input_proj = tnn.Linear(N_MELS + 2, H)
                self.fft_block = tnn.Module()
                self.fft_block.layers = tnn.ModuleList(
                    [TLayer() for _ in range(LAYERS)]
                )
                self.emotion_embedding = tnn.Embedding(N_EMO, H)
                self.classifier = tnn.Linear(H, N_EMO)

            def forward(self, x, lengths, emotions):
                t = x.shape[1]
                pad = torch.arange(t)[None, :] >= lengths[:, None]
                h = self.input_proj(x)
                for layer in self.fft_block.layers:
                    h = layer(h, key_padding_mask=pad)
                h = h + self.emotion_embedding(emotions).unsqueeze(1)
                h = h.masked_fill(pad.unsqueeze(-1), 0.0)
                return self.classifier(h)

        self.intensity_extractor = Ext()
        self.projector = tnn.Linear(N_EMO, 1, bias=False)

    def forward(self, emo_x, neu_x, emotions, lengths, lambdas):
        li = lambdas[0][:, None, None]
        lj = lambdas[1][:, None, None]
        xi = li * emo_x + (1 - li) * neu_x
        xj = lj * emo_x + (1 - lj) * neu_x
        ii = self.intensity_extractor(xi, lengths, emotions)
        ij = self.intensity_extractor(xj, lengths, emotions)
        hi = ii.sum(1) / lengths[:, None].float()
        hj = ij.sum(1) / lengths[:, None].float()
        ri = self.projector(hi).squeeze(-1)
        rj = self.projector(hj).squeeze(-1)
        return li, lj, ii, ij, hi, hj, ri, rj


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    tmodel = TRank().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = rank_params_from_torch(sd, LAYERS, HEADS)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    jmodel = RankModel(
        n_mels=N_MELS, n_heads=HEADS, n_emotions=N_EMO, n_layers=LAYERS,
        hidden_dim=H, kernel_size=KERNEL, ffn_mult=MULT, dropout=0.0,
    )
    rng = np.random.default_rng(0)
    emo_x = rng.standard_normal((B, T, N_MELS + 2)).astype(np.float32)
    neu_x = rng.standard_normal((B, T, N_MELS + 2)).astype(np.float32)
    emotions = np.array([1, 2, 1])
    lengths = np.array([T, T * 4 // 5, T * 3 // 5])
    lambdas = np.array([[0.8, 0.5, 0.2], [0.1, 0.9, 0.6]], np.float32)
    return tmodel, jmodel, variables, (emo_x, neu_x, emotions, lengths, lambdas)


def test_outputs_match(setup):
    tmodel, jmodel, variables, (emo_x, neu_x, emotions, lengths, lambdas) = setup
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(emo_x), torch.tensor(neu_x),
            torch.tensor(emotions), torch.tensor(lengths),
            torch.tensor(lambdas),
        )
    j_out = jmodel.apply(
        variables, jnp.asarray(emo_x), jnp.asarray(neu_x),
        jnp.asarray(emotions), jnp.asarray(lengths), jnp.asarray(lambdas),
    )
    # frame intensities, pooled features, rank scores
    maxes = {}
    for idx, name in [(2, "I_i"), (3, "I_j"), (4, "h_i"), (5, "h_j"),
                      (6, "r_i"), (7, "r_j")]:
        maxes[name] = float(
            np.abs(np.asarray(j_out[idx]) - t_out[idx].numpy()).max()
        )
        np.testing.assert_allclose(
            np.asarray(j_out[idx]), t_out[idx].numpy(),
            rtol=2e-4, atol=1e-4 if _FULL else 2e-5, err_msg=name,
        )
    _record(
        "rank_outputs",
        dims=dict(H=H, LAYERS=LAYERS, KERNEL=KERNEL, N_MELS=N_MELS, T=T),
        max_abs=maxes,
    )


def test_loss_matches(setup):
    tmodel, jmodel, variables, (emo_x, neu_x, emotions, lengths, lambdas) = setup
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(emo_x), torch.tensor(neu_x),
            torch.tensor(emotions), torch.tensor(lengths),
            torch.tensor(lambdas),
        )
    # torch loss with the published semantics
    y = torch.tensor(emotions)
    y0 = torch.zeros_like(y)
    li, lj = t_out[0].squeeze(), t_out[1].squeeze()
    t_mix = (
        li * F.cross_entropy(t_out[4], y) + (1 - li) * F.cross_entropy(t_out[4], y0)
        + lj * F.cross_entropy(t_out[5], y) + (1 - lj) * F.cross_entropy(t_out[5], y0)
    ).mean()
    pij = torch.sigmoid(t_out[6] - t_out[7])
    ld = (li - lj + 1) / 2
    t_rank = -(ld * torch.log(pij + 1e-8) + (1 - ld) * torch.log(1 - pij + 1e-8)).mean()
    t_total = 0.1 * t_mix + 1.0 * t_rank

    j_out = jmodel.apply(
        variables, jnp.asarray(emo_x), jnp.asarray(neu_x),
        jnp.asarray(emotions), jnp.asarray(lengths), jnp.asarray(lambdas),
    )
    j_total, _ = rank_loss(j_out, jnp.asarray(emotions), alpha=0.1, beta=1.0)
    _record(
        "rank_loss",
        torch_total=float(t_total), jax_total=float(j_total),
        rel_err=abs(float(j_total) - float(t_total))
        / max(abs(float(t_total)), 1e-12),
    )
    assert float(j_total) == pytest.approx(float(t_total), rel=1e-4)


def test_optimization_trajectory_matches(setup):
    """Multi-step loss-curve parity: 4 AdamW steps from identical weights on
    a fixed batch track the torch trajectory (BASELINE config 2's
    'loss-curve parity at matched config', extended from single-forward)."""
    import copy

    import optax

    from emotts.losses import rank_loss as j_rank_loss

    tmodel, jmodel, variables, (emo_x, neu_x, emotions, lengths, lambdas) = setup
    tmodel = copy.deepcopy(tmodel).train(False)  # dropout-free, same math
    lr, wd = 1e-3, 1e-2

    def torch_loss():
        t_out = tmodel(
            torch.tensor(emo_x), torch.tensor(neu_x),
            torch.tensor(emotions), torch.tensor(lengths),
            torch.tensor(lambdas),
        )
        y = torch.tensor(emotions)
        y0 = torch.zeros_like(y)
        li, lj = t_out[0].squeeze(), t_out[1].squeeze()
        t_mix = (
            li * F.cross_entropy(t_out[4], y)
            + (1 - li) * F.cross_entropy(t_out[4], y0)
            + lj * F.cross_entropy(t_out[5], y)
            + (1 - lj) * F.cross_entropy(t_out[5], y0)
        ).mean()
        pij = torch.sigmoid(t_out[6] - t_out[7])
        ld = (li - lj + 1) / 2
        t_rank = -(
            ld * torch.log(pij + 1e-8) + (1 - ld) * torch.log(1 - pij + 1e-8)
        ).mean()
        return 0.1 * t_mix + 1.0 * t_rank

    opt_t = torch.optim.AdamW(
        tmodel.parameters(), lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd
    )
    t_losses = []
    for _ in range(4):
        opt_t.zero_grad()
        loss = torch_loss()
        t_losses.append(float(loss))
        loss.backward()
        opt_t.step()

    def j_loss(params):
        out = jmodel.apply(
            params, jnp.asarray(emo_x), jnp.asarray(neu_x),
            jnp.asarray(emotions), jnp.asarray(lengths), jnp.asarray(lambdas),
        )
        total, _ = j_rank_loss(out, jnp.asarray(emotions), alpha=0.1, beta=1.0)
        return total

    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    params = variables
    opt_state = tx.init(params)
    step = jax.jit(
        lambda p, s: (lambda g: (lambda u, s2: (optax.apply_updates(p, u), s2))(
            *tx.update(g, s, p)
        ))(jax.grad(j_loss)(p))
    )
    j_losses = []
    for _ in range(4):
        j_losses.append(float(j_loss(params)))
        params, opt_state = step(params, opt_state)

    _record("rank_trajectory", torch=t_losses, jax=j_losses)
    # per-step tolerance: optimizer noise amplifies chaotically with width
    # and step count — at production dims (~30M params) a 1e-6 forward
    # delta grows ~10x per AdamW step, so the full-size bound widens with
    # the step index while step 0 stays the forward-parity bound
    if _FULL:
        for i, (j_l, t_l) in enumerate(zip(j_losses, t_losses)):
            np.testing.assert_allclose(
                j_l, t_l, rtol=5e-4 * (10 ** min(i, 2)), atol=1e-4
            )
    else:
        np.testing.assert_allclose(j_losses, t_losses, rtol=5e-3, atol=1e-4)
    # and both actually descend (toy dims; at production dims 4 steps of
    # lr=1e-3 from random init oscillate — trajectory identity above is
    # the full-size gate, measured at ~1e-6 rel through step 3)
    if not _FULL:
        assert j_losses[-1] < j_losses[0]
