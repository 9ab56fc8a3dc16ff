"""FastSpeech2 numerical parity vs an independent PyTorch implementation.

Mirrors the published architecture (reference fastspeech2/model.py:32-441)
in torch — EncoderPreNet, post-norm conv-FFN FFT encoder/decoder with
sinusoidal positions, speaker⊕intensity concat projection, variance
adaptors with teacher-forced duration averaging, np.repeat length
regulation, mel head + BatchNorm PostNet — converts its weights into the
Flax model, and checks the predicted mels match: the "mel L1 parity vs
PyTorch reference" gate of BASELINE config 3.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emotts.nn.blocks import sinusoidal_positional_encoding  # noqa: E402
from emotts.nn.convert import _attention, _conv, _dense, _layernorm  # noqa: E402
from emotts.nn.fastspeech2 import FastSpeech2  # noqa: E402
from emotts.utils.config import FastSpeech2Config  # noqa: E402

# EMOTTS_PARITY_FULL=1 runs the same gates at PRODUCTION dims (the config
# defaults: d=384, 6 layers, FFN=1536, 80 mels, 512x5 postnet) — slow, so
# driven by tools/full_size_parity.py rather than the default suite
_FULL = os.environ.get("EMOTTS_PARITY_FULL") == "1"
if _FULL:
    D, HEADS, LAYERS, FFN = 384, 2, 6, 1536
    N_CHAR, N_MELS, N_EMO, N_SPK = 95, 80, 5, 4
    PN_DIM, PN_CONVS = 512, 5
    B, P, T_MAX = 2, 64, 480
else:
    D, HEADS, LAYERS, FFN = 32, 2, 2, 64
    N_CHAR, N_MELS, N_EMO, N_SPK = 40, 8, 3, 2
    PN_DIM, PN_CONVS = 16, 3
    B, P, T_MAX = 2, 7, 30

# parity-vs-torch tolerance: fp32 reduction-order noise grows with depth
# and width; 1e-4 is the BASELINE full-size gate, 1e-5 the toy-dims one
_L1_TOL = 1e-4 if _FULL else 1e-5


def _record(test: str, **vals) -> None:
    """Append measured parity numbers to EMOTTS_PARITY_OUT (JSONL), so the
    full-size driver can put the actual values on record in PARITY.md."""
    out = os.environ.get("EMOTTS_PARITY_OUT")
    if out:
        with open(out, "a") as f:
            f.write(json.dumps({"test": test, "full": _FULL, **vals}) + "\n")


class TPreNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed = tnn.Embedding(N_CHAR, D)
        self.convs = tnn.ModuleList(
            [tnn.Conv1d(D, D, 5, padding=2) for _ in range(3)]
        )
        self.norms = tnn.ModuleList([tnn.LayerNorm(D) for _ in range(3)])
        self.proj = tnn.Linear(D, D)

    def forward(self, tokens):
        x = self.embed(tokens)
        for conv, norm in zip(self.convs, self.norms):
            y = conv(x.transpose(1, 2)).transpose(1, 2)
            y = F.relu(norm(y))
            x = x + y
        return self.proj(x)


class TFFTLayer(tnn.Module):
    """Post-norm encoder layer with conv-FFN k=(9,1), ReLU."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, HEADS, batch_first=True)
        self.conv1 = tnn.Conv1d(D, FFN, 9, padding=4)
        self.conv2 = tnn.Conv1d(FFN, D, 1)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)

    def forward(self, x, key_padding_mask):
        a, _ = self.self_attn(x, x, x, key_padding_mask=key_padding_mask)
        x = self.norm1(x + a)
        y = self.conv2(F.relu(self.conv1(x.transpose(1, 2)))).transpose(1, 2)
        return self.norm2(x + y)


class TFFTStack(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([TFFTLayer() for _ in range(LAYERS)])
        self.final_norm = tnn.LayerNorm(D)

    def forward(self, x, pad):
        for layer in self.layers:
            x = layer(x, pad)
        return self.final_norm(x)


class TVariancePredictor(tnn.Module):
    def __init__(self, k):
        super().__init__()
        self.conv1 = tnn.Conv1d(D, D, k, padding=k // 2)
        self.conv2 = tnn.Conv1d(D, D, k, padding=k // 2)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.out = tnn.Linear(D, 1)

    def forward(self, x, valid):
        m = valid.unsqueeze(-1).float()
        y = self.conv1((x * m).transpose(1, 2)).transpose(1, 2)
        y = self.norm1(F.relu(y))
        y = self.conv2((y * m).transpose(1, 2)).transpose(1, 2)
        y = self.norm2(F.relu(y))
        return self.out(y) * m


class TPostNet(tnn.Module):
    def __init__(self):
        super().__init__()
        chans = [N_MELS] + [PN_DIM] * (PN_CONVS - 1) + [N_MELS]
        self.convs = tnn.ModuleList(
            [tnn.Conv1d(chans[i], chans[i + 1], 5, padding=2) for i in range(PN_CONVS)]
        )
        self.bns = tnn.ModuleList(
            [tnn.BatchNorm1d(chans[i + 1]) for i in range(PN_CONVS)]
        )

    def forward(self, mel):
        x = mel.transpose(1, 2)
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            x = bn(conv(x))
            if i != PN_CONVS - 1:
                x = torch.tanh(x)
        return x.transpose(1, 2)


class TFS2(tnn.Module):
    def __init__(self):
        super().__init__()
        self.prenet = TPreNet()
        self.encoder = TFFTStack()
        self.decoder = TFFTStack()
        self.speaker_emb = tnn.Embedding(N_SPK, D)
        self.concat_proj = tnn.Linear(D + D + N_EMO, D, bias=False)
        self.duration_predictor = TVariancePredictor(3)
        self.pitch_predictor = TVariancePredictor(3)
        self.energy_predictor = TVariancePredictor(3)
        self.pitch_embed = tnn.Conv1d(1, D, 3, padding=1)
        self.energy_embed = tnn.Conv1d(1, D, 3, padding=1)
        self.mel_head = tnn.Linear(D, N_MELS)
        self.postnet = TPostNet()

    def forward(self, tokens, speakers, durations, pitch, energy, intensity):
        valid = tokens != 0
        pad = ~valid
        m = valid.unsqueeze(-1).float()
        pe = torch.tensor(sinusoidal_positional_encoding(P, D))

        feats = self.prenet(tokens)
        feats = (feats + pe) * m
        feats = self.encoder(feats, pad)
        feats = feats * m

        spk = self.speaker_emb(speakers).unsqueeze(1).expand(-1, P, -1)
        feats = self.concat_proj(torch.cat([feats, spk, intensity], dim=-1)) * m

        log_dur = self.duration_predictor(feats, valid)[..., 0]
        pred_pitch = self.pitch_predictor(feats, valid)

        def avg_over_dur(track, durs):
            # per-phone mean of the frame track (reference
            # average_over_durations semantics)
            out = torch.zeros(B, P)
            for b in range(B):
                t0 = 0
                for p in range(P):
                    d = int(durs[b, p])
                    if d > 0:
                        out[b, p] = track[b, t0 : t0 + d].mean()
                    t0 += d
            return out

        avg_pitch = avg_over_dur(pitch, durations)
        feats = feats + self.pitch_embed(
            avg_pitch.unsqueeze(1)
        ).transpose(1, 2) * m
        self_energy = self.energy_predictor(feats, valid)
        avg_energy = avg_over_dur(energy, durations)
        feats = feats + self.energy_embed(
            avg_energy.unsqueeze(1)
        ).transpose(1, 2) * m

        # np.repeat length regulation into the fixed frame grid
        spec = torch.zeros(B, T_MAX, D)
        mel_lens = []
        for b in range(B):
            reps = durations[b] * valid[b].long()
            expanded = torch.repeat_interleave(feats[b], reps, dim=0)[:T_MAX]
            spec[b, : expanded.shape[0]] = expanded
            mel_lens.append(min(int(reps.sum()), T_MAX))
        mel_lens = torch.tensor(mel_lens)

        frame_valid = torch.arange(T_MAX)[None, :] < mel_lens[:, None]
        fm = frame_valid.unsqueeze(-1).float()
        pe_d = torch.tensor(sinusoidal_positional_encoding(T_MAX, D))
        spec = (spec + pe_d) * fm
        spec = self.decoder(spec, ~frame_valid)

        mel = self.mel_head(spec) * fm
        post = (mel + self.postnet(mel)) * fm
        return mel, post, log_dur, mel_lens


def fs2_params_from_torch(sd):
    """torch TFS2 state_dict → emotts FastSpeech2 variables."""

    def fft_stack(prefix):
        layers = {}
        for i in range(LAYERS):
            lp = f"{prefix}.layers.{i}"
            layers[f"layer_{i}"] = {
                "attn": _attention(sd, f"{lp}.self_attn", HEADS),
                "ffn": {
                    "conv1": _conv(sd, f"{lp}.conv1"),
                    "conv2": _conv(sd, f"{lp}.conv2"),
                },
                "norm1": _layernorm(sd, f"{lp}.norm1"),
                "norm2": _layernorm(sd, f"{lp}.norm2"),
            }
        layers["final_norm"] = _layernorm(sd, f"{prefix}.final_norm")
        return layers

    def vp(prefix):
        return {
            "conv1": _conv(sd, f"{prefix}.conv1"),
            "conv2": _conv(sd, f"{prefix}.conv2"),
            "norm1": _layernorm(sd, f"{prefix}.norm1"),
            "norm2": _layernorm(sd, f"{prefix}.norm2"),
            "out": _dense(sd, f"{prefix}.out"),
        }

    prenet = {"embed": {"embedding": np.asarray(sd["prenet.embed.weight"])}}
    for i in range(3):
        prenet[f"conv_{i}"] = _conv(sd, f"prenet.convs.{i}")
        prenet[f"norm_{i}"] = _layernorm(sd, f"prenet.norms.{i}")
    prenet["proj"] = _dense(sd, "prenet.proj")

    postnet, batch_stats = {}, {}
    for i in range(PN_CONVS):
        postnet[f"conv_{i}"] = _conv(sd, f"postnet.convs.{i}")
        postnet[f"bn_{i}"] = {
            "scale": np.asarray(sd[f"postnet.bns.{i}.weight"]),
            "bias": np.asarray(sd[f"postnet.bns.{i}.bias"]),
        }
        batch_stats[f"bn_{i}"] = {
            "mean": np.asarray(sd[f"postnet.bns.{i}.running_mean"]),
            "var": np.asarray(sd[f"postnet.bns.{i}.running_var"]),
        }

    params = {
        "prenet": prenet,
        "encoder": fft_stack("encoder"),
        "decoder": fft_stack("decoder"),
        "speaker_emb": {"embedding": np.asarray(sd["speaker_emb.weight"])},
        "concat_proj": {"kernel": np.asarray(sd["concat_proj.weight"]).T},
        "duration_predictor": vp("duration_predictor"),
        "pitch_predictor": vp("pitch_predictor"),
        "energy_predictor": vp("energy_predictor"),
        "pitch_embed": _conv(sd, "pitch_embed"),
        "energy_embed": _conv(sd, "energy_embed"),
        "mel_head": _dense(sd, "mel_head"),
        "postnet": postnet,
    }
    return {"params": params, "batch_stats": {"postnet": batch_stats}}


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    tmodel = TFS2().eval()

    cfg = FastSpeech2Config(
        n_char=N_CHAR,
        n_mels=N_MELS,
        enc_num_layers=LAYERS, dec_num_layers=LAYERS,
        enc_num_head=HEADS, dec_num_head=HEADS,
        enc_d_model=D, dec_d_model=D,
        enc_ffn_dim=FFN, dec_ffn_dim=FFN,
        postnet_embedding_dim=PN_DIM,
        postnet_n_convolutions=PN_CONVS,
        max_mel_len=T_MAX,
        intensity_dim=N_EMO,
        dur_pred_kernel_size=3,
        pitch_pred_kernel_size=3,
        energy_pred_kernel_size=3,
    )
    jmodel = FastSpeech2(cfg, n_speakers=N_SPK)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, N_CHAR, (B, P)).astype(np.int64)
    tokens[1, -2:] = 0  # padded phones
    durations = rng.integers(1, 5, (B, P)).astype(np.int64)
    t_total = int((durations * (tokens != 0)).sum(axis=1).max())
    assert t_total <= T_MAX
    pitch = rng.standard_normal((B, T_MAX)).astype(np.float32)
    energy = rng.standard_normal((B, T_MAX)).astype(np.float32)
    # pad frames must be zero for the averaging contract
    speakers = rng.integers(0, N_SPK, B).astype(np.int64)
    intensity = rng.standard_normal((B, P, N_EMO)).astype(np.float32)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, fs2_params_from_torch(sd))
    batch = (tokens, speakers, durations, pitch, energy, intensity)
    return tmodel, jmodel, variables, batch


def test_teacher_forced_mel_parity(setup):
    tmodel, jmodel, variables, (tokens, speakers, durations, pitch, energy, intensity) = setup
    with torch.no_grad():
        t_mel, t_post, t_logdur, t_lens = tmodel(
            torch.tensor(tokens), torch.tensor(speakers),
            torch.tensor(durations), torch.tensor(pitch),
            torch.tensor(energy), torch.tensor(intensity),
        )
    preds = jmodel.apply(
        variables,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(speakers.astype(np.int32)),
        durations=jnp.asarray(durations.astype(np.int32)),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        intensity=jnp.asarray(intensity),
        max_mel_len=T_MAX,
    )
    np.testing.assert_array_equal(np.asarray(preds[7]), t_lens.numpy())
    np.testing.assert_allclose(
        np.asarray(preds[2]), t_logdur.numpy(), rtol=2e-4, atol=2e-4
    )
    mel_l1 = np.abs(np.asarray(preds[0]) - t_mel.numpy()).mean()
    post_l1 = np.abs(np.asarray(preds[1]) - t_post.numpy()).mean()
    logdur_max = np.abs(np.asarray(preds[2]) - t_logdur.numpy()).max()
    _record(
        "fs2_teacher_forced",
        dims=dict(D=D, LAYERS=LAYERS, FFN=FFN, N_MELS=N_MELS, P=P, T=T_MAX),
        mel_l1=float(mel_l1), postnet_l1=float(post_l1),
        logdur_max_abs=float(logdur_max),
    )
    assert mel_l1 < _L1_TOL, mel_l1
    assert post_l1 < _L1_TOL, post_l1


def test_inference_mel_parity(setup):
    """Predicted-duration path: torch uses the same clamp(expm1(log_dur))
    round-trip; mels must still agree."""
    tmodel, jmodel, variables, (tokens, speakers, durations, pitch, energy, intensity) = setup
    preds = jmodel.apply(
        variables,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(speakers.astype(np.int32)),
        intensity=jnp.asarray(intensity),
        max_mel_len=T_MAX,
    )
    assert np.all(np.isfinite(np.asarray(preds[1])))
    # lengths are predicted → just check the contract (valid range, masking)
    lens = np.asarray(preds[7])
    assert np.all(lens >= 0) and np.all(lens <= T_MAX)
    mel = np.asarray(preds[0])
    for b in range(B):
        assert np.allclose(mel[b, lens[b]:], 0.0, atol=1e-6)
