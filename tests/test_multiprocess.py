"""Real multi-process integration test: 2 x jax.distributed processes,
4 virtual CPU devices each, driving actual FS2 pjit train steps through the
process-sharded BucketLoader + make_array_from_process_local_data path.

This is the only place the multi-host code path actually EXECUTES (the
loader's process sharding and the trainers' jax.process_index() wiring are
otherwise unit-tested single-process).  Asserts:

* both processes run in lockstep (same step count, identical losses), and
* the 2-process global losses equal a 1-process run on the same 8-device
  virtual topology (the distributed assembly changes nothing numerically).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from emotts.data import build_fs2_splits, build_rank_pair_lists, preprocess_all
from emotts.utils.config import save_config
from tests.synthetic_corpus import make_corpus

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU client in subprocesses
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    return env


def _run_workers(cfg_path: str, out_dir: Path, nprocs: int, steps: int = 3):
    coord = f"127.0.0.1:{_free_port()}"
    # 8 GLOBAL devices regardless of process count, so the 1-proc and
    # 2-proc runs compile the identical 8-way mesh program and differ only
    # in how the global arrays are assembled
    devices_per_proc = 8 // nprocs
    procs = []
    for pid in range(nprocs):
        out = out_dir / f"proc{nprocs}_{pid}.json"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(REPO / "tests" / "mp_fs2_worker.py"),
                    "--coord", coord,
                    "--nprocs", str(nprocs),
                    "--pid", str(pid),
                    "--config", cfg_path,
                    "--out", str(out),
                    "--steps", str(steps),
                ],
                cwd=str(REPO),
                env=_worker_env(devices_per_proc),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    results, logs = [], []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, (
            f"worker {pid}/{nprocs} failed:\n{logs[-1][-3000:]}"
        )
        results.append(
            json.loads((out_dir / f"proc{nprocs}_{pid}.json").read_text())
        )
    return results


@pytest.fixture(scope="module")
def mp_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_fs2")
    cfg = make_corpus(str(root), utts_per_emotion=5)
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    build_fs2_splits(cfg)
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 3
    # global batch 8 shards 1 row/device over the 8-device data axis; fp32
    # so the 1-proc and 2-proc runs compare tightly
    cfg.train_fs2.batch_size = 8
    cfg.train_fs2.compute_dtype = "float32"
    cfg_path = str(root / "mp_cfg.yaml")
    save_config(cfg, cfg_path)
    return cfg_path, root


def test_two_process_fs2_lockstep_and_parity(mp_corpus):
    cfg_path, root = mp_corpus
    out_dir = Path(root) / "mp_out"
    out_dir.mkdir(exist_ok=True)

    two = _run_workers(cfg_path, out_dir, nprocs=2)
    assert [r["n_global_devices"] for r in two] == [8, 8]
    assert [r["n_local_devices"] for r in two] == [4, 4]
    # lockstep: same step counter, same global losses on every step
    assert two[0]["step"] == two[1]["step"] == 3
    np.testing.assert_allclose(two[0]["losses"], two[1]["losses"], rtol=0, atol=0)

    one = _run_workers(cfg_path, out_dir, nprocs=1)
    assert one[0]["n_global_devices"] == 8  # same global topology
    # distributed assembly must not change the numbers: same global batch,
    # same seeded init, same 8-way mesh program => same losses (tiny
    # tolerance for assembly-order/f32 noise)
    np.testing.assert_allclose(one[0]["losses"], two[0]["losses"], rtol=1e-5)
    assert all(np.isfinite(one[0]["losses"]))
