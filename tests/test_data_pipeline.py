"""End-to-end data pipeline tests on the synthetic corpus."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from emotts.data import (
    BucketLoader,
    FS2Dataset,
    RankPairDataset,
    average_by_duration,
    build_fs2_splits,
    build_rank_pair_lists,
    collate_fs2,
    collate_rank_pairs,
    expand_by_duration,
    pick_bucket,
    preprocess_all,
)
from tests.synthetic_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = make_corpus(str(root))
    counts = preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    build_fs2_splits(cfg)
    return cfg, counts


def test_preprocess_artifacts(corpus_cfg):
    cfg, counts = corpus_cfg
    # 2 speakers × 3 emotions, 8 utts each
    assert len(counts) == 6
    assert all(v == 8 for v in counts.values())

    npz_files = sorted(Path(cfg.data.preprocessed_path).glob("*/*.npz"))
    assert len(npz_files) == 48
    d = np.load(npz_files[0], allow_pickle=True)
    for key in ["phones", "emotion", "speaker", "audio_id", "audio_path",
                "transcript", "textgrid_path", "mel", "pitch", "energy", "durations"]:
        assert key in d, key
    # feature-length consistency contract (reference asserts this)
    total = int(d["durations"].sum())
    assert d["mel"].shape == (cfg.audio.n_mels, total)
    assert d["pitch"].shape == (total,)
    assert d["energy"].shape == (total,)

    stats = json.loads((Path(cfg.data.preprocessed_path) / "stats.json").read_text())
    assert set(stats.keys()) == set(cfg.data.speakers)
    entry = stats[cfg.data.speakers[0]][cfg.data.emotions[1]]
    assert len(entry["pitch"]) == 4 and len(entry["energy"]) == 4
    # z-normalized: mean≈0 over the group
    all_pitch = np.concatenate(
        [np.load(p, allow_pickle=True)["pitch"]
         for p in Path(cfg.data.preprocessed_path).glob(f"{cfg.data.speakers[0]}/{cfg.data.emotions[1]}_*.npz")]
    )
    assert abs(all_pitch.mean()) < 0.5


def test_pair_lists(corpus_cfg):
    cfg, _ = corpus_cfg
    train = (Path(cfg.data.preprocessed_path) / "train.txt").read_text().splitlines()
    test = (Path(cfg.data.preprocessed_path) / "test.txt").read_text().splitlines()
    # per speaker × 2 non-neutral emotions: (8-2) train × 2 pairs, 2 test × 2
    assert len(train) == 2 * 2 * 6 * 2
    assert len(test) == 2 * 2 * 2 * 2
    parts = train[0].split("|")
    assert len(parts) == 4
    assert parts[0] in cfg.data.speakers
    assert parts[1] != "neutral"
    # determinism: rebuilding produces identical lists
    train2, test2 = build_rank_pair_lists(cfg)
    assert train2 == train and test2 == test


def test_fs2_splits(corpus_cfg):
    cfg, _ = corpus_cfg
    train, valid = build_fs2_splits(cfg)
    assert len(train) + len(valid) == 48
    assert len(train) == int(24 * 0.8) * 2
    assert all(os.path.exists(p) for p in train + valid)


def test_rank_dataset_and_collate(corpus_cfg):
    cfg, _ = corpus_cfg
    ds = RankPairDataset(cfg, "train")
    ex = ds[0]
    assert ex.emo_x.shape[1] == cfg.audio.n_mels + 2
    assert ex.emo_x.shape == ex.neu_x.shape
    assert ex.length == ex.emo_x.shape[0]
    assert ex.emotion > 0  # never neutral

    batch = collate_rank_pairs([ds[0], ds[1]], frame_bucket=128)
    assert batch["emo_x"].shape == (2, 128, 82)
    assert (batch["emo_x"][0, batch["lengths"][0]:] == 0).all()


def test_fs2_dataset_and_collate(corpus_cfg):
    cfg, _ = corpus_cfg
    ds = FS2Dataset(cfg, "train")
    ex = ds[0]
    assert ex.mel.shape[1] == cfg.audio.n_mels
    assert ex.rank_x.shape == (ex.mel.shape[0], cfg.audio.n_mels + 2)
    assert len(ex.phonemes) == len(ex.durations)
    assert int(ex.durations.sum()) == ex.mel.shape[0]

    batch = collate_fs2([ds[0], ds[1]], phone_bucket=16, frame_bucket=128)
    assert batch["phonemes"].shape == (2, 16)
    assert batch["mel"].shape == (2, 128, 80)
    assert batch["rank_x"].shape == (2, 128, 82)
    # Σdurations == mel_len per example (consistent teacher forcing)
    np.testing.assert_array_equal(
        batch["durations"].sum(axis=1), batch["mel_len"]
    )


def test_bucket_loader(corpus_cfg):
    cfg, _ = corpus_cfg
    ds = RankPairDataset(cfg, "train")
    loader = BucketLoader(
        ds,
        buckets=cfg.bucketing.frame_buckets,
        batch_size=4,
        collate=collate_rank_pairs,
        shuffle=True,
        seed=0,
    )
    shapes = set()
    n_batches = 0
    for batch in loader.epoch(0):
        assert batch["emo_x"].shape[0] == 4
        shapes.add(batch["emo_x"].shape)
        n_batches += 1
    assert n_batches > 0
    # static bucket shapes only
    assert all(s[1] in cfg.bucketing.frame_buckets for s in shapes)
    # deterministic plan per epoch
    assert loader.plan_epoch(3) == loader.plan_epoch(3)
    assert loader.plan_epoch(1) != loader.plan_epoch(2)


def test_average_expand_by_duration():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], dtype=np.float32)
    durs = np.array([2, 0, 3, 1])
    avg = average_by_duration(vals, durs)
    np.testing.assert_allclose(avg, [1.5, 0.0, 4.0, 6.0])
    exp = expand_by_duration(avg, durs)
    np.testing.assert_allclose(exp, [1.5, 1.5, 4.0, 4.0, 4.0, 6.0])


def test_pick_bucket():
    assert pick_bucket(100, [64, 128, 256]) == 128
    assert pick_bucket(64, [64, 128]) == 64
    assert pick_bucket(300, [64, 128, 256]) == -1


def test_device_mel_preprocess_matches_host(tmp_path):
    """Deferred device-batched mel/energy must match the host numpy path."""
    from tests.synthetic_corpus import make_corpus

    cfg_a = make_corpus(str(tmp_path / "a"), utts_per_emotion=3, seed=7)
    cfg_b = make_corpus(str(tmp_path / "b"), utts_per_emotion=3, seed=7)
    preprocess_all(cfg_a, verbose=False, device_mel=False)
    preprocess_all(cfg_b, verbose=False, device_mel=True)

    files_a = sorted(Path(cfg_a.data.preprocessed_path).glob("*/*.npz"))
    files_b = sorted(Path(cfg_b.data.preprocessed_path).glob("*/*.npz"))
    assert len(files_a) == len(files_b) > 0
    for fa, fb in zip(files_a, files_b):
        a = np.load(fa, allow_pickle=True)
        b = np.load(fb, allow_pickle=True)
        assert a["mel"].shape == b["mel"].shape
        # fp32 DFT matmul vs float64 FFT tolerance (see test_audio_mel)
        assert np.abs(a["mel"] - b["mel"]).mean() < 5e-3
        np.testing.assert_allclose(a["energy"], b["energy"], atol=2e-2)
        np.testing.assert_array_equal(a["durations"], b["durations"])


def test_match_transcript_pairing(tmp_path):
    from tests.synthetic_corpus import make_corpus

    cfg = make_corpus(str(tmp_path / "mt"), utts_per_emotion=4, seed=3)
    cfg.data.match_transcript = True
    cfg.data.test_utts_per_emotion = 1
    preprocess_all(cfg, verbose=False)
    train, test = build_rank_pair_lists(cfg)
    # matched-transcript mode pairs identical sentence ids
    for line in train + test:
        _, _, emo_id, neu_id = line.split("|")
        assert emo_id == neu_id


def test_bucket_loader_process_sharding(tmp_path):
    """Multi-host row sharding: every process computes the identical batch
    plan (lockstep shapes/steps) and loads a disjoint contiguous row slice
    of each batch that reassembles to the full batch."""
    from emotts.data.loader import BucketLoader

    class Toy:
        def __len__(self):
            return 50

        def __getitem__(self, i):
            return i

        def length_of(self, i):
            return 10 + (i % 3)

    def collate(examples, bucket):
        return {"idx": np.asarray(examples), "bucket": bucket}

    full = BucketLoader(Toy(), [16], 4, collate, seed=1)
    shards = [
        BucketLoader(Toy(), [16], 4, collate, seed=1, process_index=p, process_count=2)
        for p in range(2)
    ]
    plan_full = [b for b in full.plan_epoch(3) if len(b) == 4]
    plans = [sh.plan_epoch(3) for sh in shards]
    # identical plans on every host (lockstep collectives)
    assert plans[0] == plans[1] == plan_full
    # rows of each batch reassemble exactly; buckets agree across hosts
    for bi, idxs in enumerate(plan_full):
        parts = [sh._make_batch(list(idxs)) for sh in shards]
        assert parts[0]["bucket"] == parts[1]["bucket"]
        rows = np.concatenate([p["idx"] for p in parts])
        np.testing.assert_array_equal(rows, np.asarray(idxs))
        assert all(len(p["idx"]) == 2 for p in parts)


def test_loader_pads_only_trailing_partial_batches(tmp_path):
    """pad_to_multiple pads ONLY the trailing partial batch (review finding:
    it must never grow full batches), and requires batch_size divisible."""
    import pytest

    from emotts.data.loader import BucketLoader

    class Toy:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return i

        def length_of(self, i):
            return 10

    loader = BucketLoader(
        Toy(), buckets=[16], batch_size=4,
        collate=lambda ex, b: {"idx": np.array(ex)},
        shuffle=False, drop_last=False, pad_to_multiple=2,
    )
    plans = loader.plan_epoch(0)
    sizes = sorted(len(p) for p in plans)
    assert sizes == [4, 4, 4]  # 11 → 4+4+3, trailing 3 padded to 4
    tail = plans[-1]
    assert tail[3] == tail[0]  # cyclic repeat of the first example
    with pytest.raises(AssertionError):
        BucketLoader(Toy(), buckets=[16], batch_size=3,
                     collate=lambda ex, b: {}, pad_to_multiple=2)
