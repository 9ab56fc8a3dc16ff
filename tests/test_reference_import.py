"""Reference-checkpoint import: SpeechBrain-layout FastSpeech2 state_dicts
convert (emotts/nn/convert.py::fs2_params_from_reference_torch) and run
bit-close in the compat architecture (prenet_style=embedding,
postnet_style=speechbrain), and the import-reference CLI materializes
experiments that load_synthesizer can drive.

The torch model here replicates the *reference's* module layout
(fastspeech2/model.py:168-276 built from SpeechBrain wrappers: linear.Linear
stores `.w`, CNN.Conv1d `.conv`, Embedding `.Embedding`, attention
`self_att.att`, 1dcnn FFN `pos_ffn.{0,2}`, sb LayerNorm `.norm`) so the
state_dict keys match what a real reference best_model.pth contains.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emotts.nn.blocks import sinusoidal_positional_encoding  # noqa: E402
from emotts.nn.convert import fs2_params_from_reference_torch  # noqa: E402
from emotts.nn.fastspeech2 import FastSpeech2  # noqa: E402
from emotts.utils.config import FastSpeech2Config  # noqa: E402

# EMOTTS_PARITY_FULL=1 runs the import gate at PRODUCTION dims (the
# reference's real checkpoint shape: d=384, 6+6 layers, FFN=1536, 80 mels,
# 512x5 postnet) via tools/full_size_parity.py
import json  # noqa: E402
import os  # noqa: E402

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

_L1_TOL = 1e-4 if _FULL else 1e-5


def _record(test: str, **vals) -> None:
    out = os.environ.get("EMOTTS_PARITY_OUT")
    if out:
        with open(out, "a") as f:
            f.write(json.dumps({"test": test, "full": _FULL, **vals}) + "\n")


# ---- SpeechBrain wrapper stand-ins (same attribute names ⇒ same keys) ----

class SBLinear(tnn.Module):
    def __init__(self, d_in, d_out, bias=True):
        super().__init__()
        self.w = tnn.Linear(d_in, d_out, bias=bias)

    def forward(self, x):
        return self.w(x)


class SBConv1d(tnn.Module):
    """channels-last in/out like speechbrain.nnet.CNN.Conv1d."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = tnn.Conv1d(cin, cout, k, padding=k // 2)

    def forward(self, x):  # (B, T, C)
        return self.conv(x.transpose(1, 2)).transpose(1, 2)


class SBLayerNorm(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm = tnn.LayerNorm(d)

    def forward(self, x):
        return self.norm(x)


class SBEmbedding(tnn.Module):
    def __init__(self, n, d):
        super().__init__()
        self.Embedding = tnn.Embedding(n, d)

    def forward(self, x):
        return self.Embedding(x)


class SBMHA(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.att = tnn.MultiheadAttention(d, h, batch_first=True)

    def forward(self, x, key_padding_mask):
        out, _ = self.att(x, x, x, key_padding_mask=key_padding_mask)
        return out


class SBEncoderLayer(tnn.Module):
    """Post-norm, 1dcnn FFN kernel sizes (9, 1) like the reference's
    TransformerEncoder(ffn_type='1dcnn') layers."""

    def __init__(self):
        super().__init__()
        self.self_att = SBMHA(D, HEADS)
        self.pos_ffn = tnn.Sequential(
            SBConv1d(D, FFN, 9), tnn.ReLU(), SBConv1d(FFN, D, 1)
        )
        self.norm1 = SBLayerNorm(D)
        self.norm2 = SBLayerNorm(D)

    def forward(self, x, pad):
        x = self.norm1(x + self.self_att(x, pad))
        return self.norm2(x + self.pos_ffn(x))


class SBEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([SBEncoderLayer() for _ in range(LAYERS)])
        self.norm = SBLayerNorm(D)

    def forward(self, x, pad):
        for layer in self.layers:
            x = layer(x, pad)
        return self.norm(x)


class SBEncoderPreNet(tnn.Module):
    """Reference EncoderPreNet: a bare token embedding."""

    def __init__(self):
        super().__init__()
        self.token_embedding = SBEmbedding(N_CHAR, D)

    def forward(self, tokens):
        return self.token_embedding(tokens)


class SBDurationPredictor(tnn.Module):
    def __init__(self, k):
        super().__init__()
        self.conv1 = SBConv1d(D, D, k)
        self.conv2 = SBConv1d(D, D, k)
        self.linear = SBLinear(D, 1)
        self.ln1 = tnn.LayerNorm(D)
        self.ln2 = tnn.LayerNorm(D)

    def forward(self, x, x_mask):
        y = self.ln1(F.relu(self.conv1(x * x_mask)))
        y = self.ln2(F.relu(self.conv2(y * x_mask)))
        return self.linear(y * x_mask)


class SBPostNet(tnn.Module):
    """Reference PostNet layout: conv_pre → ln1 → tanh → intermediates →
    ln2 → tanh → conv_post → ln3 ('convs_intermedite' is SpeechBrain's own
    attribute spelling)."""

    def __init__(self):
        super().__init__()
        self.conv_pre = SBConv1d(N_MELS, PN_DIM, 5)
        self.convs_intermedite = tnn.ModuleList(
            [SBConv1d(PN_DIM, PN_DIM, 5) for _ in range(PN_CONVS - 2)]
        )
        self.conv_post = SBConv1d(PN_DIM, N_MELS, 5)
        self.ln1 = tnn.LayerNorm(PN_DIM)
        self.ln2 = tnn.LayerNorm(PN_DIM)
        self.ln3 = tnn.LayerNorm(N_MELS)

    def forward(self, mel):
        x = torch.tanh(self.ln1(self.conv_pre(mel)))
        for conv in self.convs_intermedite:
            x = conv(x)
        x = torch.tanh(self.ln2(x))
        return self.ln3(self.conv_post(x))


class SBFS2(tnn.Module):
    """Reference FastSpeech2 assembly with the reference's attribute names
    (fastspeech2/model.py:194-276) and teacher-forced forward semantics
    (fastspeech2/model.py:320-441)."""

    def __init__(self):
        super().__init__()
        self.encPreNet = SBEncoderPreNet()
        self.encoder = SBEncoder()
        self.decoder = SBEncoder()
        self.speaker_emb = SBEmbedding(N_SPK, D)
        self.concat_proj = SBLinear(D + D + N_EMO, D, bias=False)
        self.durPred = SBDurationPredictor(3)
        self.pitchPred = SBDurationPredictor(3)
        self.energyPred = SBDurationPredictor(3)
        self.pitchEmbed = SBConv1d(1, D, 3)
        self.energyEmbed = SBConv1d(1, D, 3)
        self.linear = SBLinear(D, N_MELS)
        self.postnet = SBPostNet()

    def forward(self, tokens, speakers, durations, pitch, energy, intensity):
        valid = tokens != 0
        pad = ~valid
        m = valid.unsqueeze(-1).float()
        pe = torch.tensor(sinusoidal_positional_encoding(P, D))

        feats = self.encPreNet(tokens)
        feats = (feats + pe) * m
        feats = self.encoder(feats, pad) * m

        spk = self.speaker_emb(speakers).unsqueeze(1).expand(-1, P, -1)
        feats = self.concat_proj(torch.cat([feats, spk, intensity], dim=-1)) * m

        log_dur = self.durPred(feats, m)[..., 0]
        pred_pitch = self.pitchPred(feats, m)

        def avg_over_dur(track, durs):
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
        feats = feats + self.pitchEmbed(avg_pitch.unsqueeze(-1)) * m
        pred_energy = self.energyPred(feats, m)
        avg_energy = avg_over_dur(energy, durations)
        feats = feats + self.energyEmbed(avg_energy.unsqueeze(-1)) * m

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

        mel = self.linear(spec) * fm
        post = (mel + self.postnet(mel)) * fm
        return mel, post, log_dur, pred_pitch, mel_lens


def compat_config():
    return FastSpeech2Config(
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
        prenet_style="embedding",
        postnet_style="speechbrain",
    )


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    tmodel = SBFS2().eval()
    cfg = compat_config()
    jmodel = FastSpeech2(cfg, n_speakers=N_SPK)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, N_CHAR, (B, P)).astype(np.int64)
    tokens[1, -2:] = 0
    durations = rng.integers(1, 5, (B, P)).astype(np.int64)
    assert int((durations * (tokens != 0)).sum(axis=1).max()) <= T_MAX
    pitch = rng.standard_normal((B, T_MAX)).astype(np.float32)
    energy = rng.standard_normal((B, T_MAX)).astype(np.float32)
    speakers = rng.integers(0, N_SPK, B).astype(np.int64)
    intensity = rng.standard_normal((B, P, N_EMO)).astype(np.float32)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, fs2_params_from_reference_torch(sd, cfg)["params"]
    )
    batch = (tokens, speakers, durations, pitch, energy, intensity)
    return tmodel, jmodel, {"params": variables}, batch


def test_reference_layout_mel_parity(setup):
    tmodel, jmodel, variables, batch = setup
    tokens, speakers, durations, pitch, energy, intensity = batch
    with torch.no_grad():
        t_mel, t_post, t_logdur, t_pitch, t_lens = tmodel(
            torch.tensor(tokens), torch.tensor(speakers),
            torch.tensor(durations), torch.tensor(pitch),
            torch.tensor(energy), torch.tensor(intensity),
        )
    j = jmodel.apply(
        variables,
        jnp.asarray(tokens), jnp.asarray(speakers.astype(np.int32)),
        durations=jnp.asarray(durations.astype(np.int32)),
        pitch=jnp.asarray(pitch), energy=jnp.asarray(energy),
        intensity=jnp.asarray(intensity), max_mel_len=T_MAX,
    )
    j_mel, j_post, j_logdur, j_lens = (
        np.asarray(j[0]), np.asarray(j[1]), np.asarray(j[2]), np.asarray(j[7])
    )
    np.testing.assert_array_equal(j_lens, t_lens.numpy())
    fm = (np.arange(T_MAX)[None, :] < j_lens[:, None])[..., None]
    l1 = np.abs(j_mel - t_mel.numpy())[np.broadcast_to(fm, j_mel.shape)].mean()
    l1_post = np.abs(j_post - t_post.numpy())[
        np.broadcast_to(fm, j_post.shape)
    ].mean()
    valid = tokens != 0
    dur_err = np.abs(j_logdur - t_logdur.numpy())[valid].max()
    _record(
        "reference_import",
        dims=dict(D=D, LAYERS=LAYERS, FFN=FFN, N_MELS=N_MELS, P=P, T=T_MAX),
        mel_l1=float(l1), postnet_l1=float(l1_post),
        logdur_max_abs=float(dur_err),
    )
    assert l1 < _L1_TOL, l1
    assert l1_post < _L1_TOL, l1_post
    assert dur_err < (1e-4 if _FULL else 1e-5), dur_err


def test_key_tolerance_plain_layout(setup):
    """The converter also accepts plain-torch key spellings (no sb wrapper
    attributes) for every tolerant lookup."""
    tmodel, jmodel, variables, batch = setup
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    renames = {
        ".w.weight": ".weight", ".w.bias": ".bias",
        ".conv.weight": ".weight", ".conv.bias": ".bias",
        ".Embedding.weight": ".weight",
        ".norm.weight": ".weight", ".norm.bias": ".bias",
        ".self_att.att.": ".self_attn.",
    }
    plain = {}
    for k, v in sd.items():
        for old, new in renames.items():
            k = k.replace(old, new)
        plain[k] = v
    cfg = compat_config()
    a = fs2_params_from_reference_torch(sd, cfg)["params"]
    b = fs2_params_from_reference_torch(plain, cfg)["params"]
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def _rank_reference_state_dict(cfg):
    """Tiny torch rank model with the reference layout
    (rank_model/model.py:56-135 attribute names)."""
    h = cfg.rank_model.hidden_dim
    n_in = cfg.audio.n_mels + 2
    k = cfg.rank_model.kernel_size
    n_emo = len(cfg.data.emotions)

    class Layer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = tnn.MultiheadAttention(
                h, cfg.rank_model.n_heads, batch_first=True
            )
            self.conv1 = tnn.Conv1d(h, h * cfg.rank_model.ffn_mult, k,
                                    padding=k // 2)
            self.conv2 = tnn.Conv1d(h * cfg.rank_model.ffn_mult, h, k,
                                    padding=k // 2)
            self.norm1 = tnn.LayerNorm(h)
            self.norm2 = tnn.LayerNorm(h)

    class Ext(tnn.Module):
        def __init__(self):
            super().__init__()
            self.input_proj = tnn.Linear(n_in, h)
            self.fft_block = tnn.Module()
            self.fft_block.layers = tnn.ModuleList(
                [Layer() for _ in range(cfg.rank_model.n_encoder_layers)]
            )
            self.emotion_embedding = tnn.Embedding(n_emo, h)
            self.classifier = tnn.Linear(h, n_emo)

    class Rank(tnn.Module):
        def __init__(self):
            super().__init__()
            self.intensity_extractor = Ext()
            self.projector = tnn.Linear(n_emo, 1, bias=False)

    torch.manual_seed(1)
    return Rank().state_dict()


def test_import_reference_cli(tmp_path):
    """import-reference converts rank + FS2 torch checkpoints and an
    intensity bank into experiments that load_synthesizer drives."""
    from emotts.cli.main import main
    from emotts.infer.synthesize import load_synthesizer
    from emotts.utils.config import Config, save_config

    cfg = Config()
    # speaker/emotion counts must match the torch checkpoint's N_SPK/N_EMO
    # (speaker embedding rows; the concat projection folds
    # intensity_dim == n_emotions into its fan-in)
    cfg.data.speakers = ["a", "b", "c", "d"][:N_SPK]
    cfg.data.emotions = ["neutral", "amused", "angry", "sleepy", "disgust"][
        :N_EMO
    ]
    cfg.data.experiment_path = str(tmp_path / "experiments")
    r = cfg.rank_model
    r.n_encoder_layers = 1
    r.hidden_dim = 16
    r.ffn_mult = 2
    r.n_heads = 2
    f = cfg.fastspeech2
    f.n_char = N_CHAR
    f.n_mels = cfg.audio.n_mels
    f.enc_num_layers = f.dec_num_layers = LAYERS
    f.enc_num_head = f.dec_num_head = HEADS
    f.enc_d_model = f.dec_d_model = D
    f.enc_ffn_dim = f.dec_ffn_dim = FFN
    f.postnet_embedding_dim = PN_DIM
    f.postnet_n_convolutions = PN_CONVS
    f.max_mel_len = 64
    f.intensity_dim = N_EMO
    f.prenet_style = "embedding"
    f.postnet_style = "speechbrain"
    cfg.bucketing.phone_buckets = [16]
    cfg.inference.rank_exp = "imported"
    cfg.inference.fs2_exp = "imported"
    cfg.inference.bucket_size = 2

    # FS2 torch checkpoint needs n_mels == cfg.audio.n_mels: rebuild a tiny
    # sb model at the right mel width
    global N_MELS
    n_mels_save = N_MELS
    N_MELS = cfg.audio.n_mels
    try:
        torch.manual_seed(2)
        fs2_sd = SBFS2().state_dict()
    finally:
        N_MELS = n_mels_save
    rank_sd = _rank_reference_state_dict(cfg)

    rank_pth = tmp_path / "rank_best.pth"
    fs2_pth = tmp_path / "fs2_best.pth"
    torch.save(rank_sd, rank_pth)
    torch.save(fs2_sd, fs2_pth)
    bank = np.random.default_rng(3).standard_normal(
        (N_SPK, N_EMO, 3, N_EMO)
    ).astype(np.float32)
    bank_path = tmp_path / "intensity.npy"
    np.save(bank_path, bank)

    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    rc = main([
        "import-reference", "--config", cfg_path,
        "--rank-checkpoint", str(rank_pth),
        "--fs2-checkpoint", str(fs2_pth),
        "--intensity", str(bank_path),
    ])
    assert rc == 0

    synth = load_synthesizer(cfg)
    assert synth.intensity_bank is not None
    ids = np.array([3, 5, 7], np.int32)
    inten = synth.intensity_for(1, 2, 1, len(ids))[None]
    mel, lens = synth.synthesize_mels(ids, np.array([1], np.int32), inten)
    assert np.isfinite(np.asarray(mel)).all()
    assert int(np.asarray(lens)[0]) >= 0


def test_import_reference_cli_rejects_wrong_arch(tmp_path):
    from emotts.cli.main import main
    from emotts.utils.config import Config, save_config

    cfg = Config()
    cfg.data.experiment_path = str(tmp_path / "experiments")
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)  # default conv/batchnorm styles
    fs2_pth = tmp_path / "fs2_best.pth"
    torch.save({}, fs2_pth)
    rc = main(["import-reference", "--config", cfg_path,
               "--fs2-checkpoint", str(fs2_pth)])
    assert rc == 2
