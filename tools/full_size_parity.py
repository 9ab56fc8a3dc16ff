"""Run the torch-parity + reference-import gates at PRODUCTION dims and
write PARITY.md.

The default test suite pins numerical parity at toy dims (D=32, 2 layers);
converter/layout bugs that only bite at real dims (head splits at d=384,
k=9 padding over long T, 512x5 postnet) would slip through.  This driver
re-runs the same three suites with EMOTTS_PARITY_FULL=1 — production dims
from the config defaults (emotts/utils/config.py:82-123, mirroring the
reference rank_model/parameter.yaml:52-59 and fastspeech2/parameter.yaml:
62-90) — collects the measured L1s the tests record, and puts them on
record in PARITY.md together with the golden-fixture residual-risk note.

Run (CPU, ~minutes):
    JAX_PLATFORMS=cpu python tools/full_size_parity.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SUITES = [
    "tests/test_fs2_torch_parity.py",
    "tests/test_rank_torch_parity.py",
    "tests/test_reference_import.py",
]


def run_full_suites(out_jsonl: str) -> bool:
    env = dict(os.environ)
    env["EMOTTS_PARITY_FULL"] = "1"
    env["EMOTTS_PARITY_OUT"] = out_jsonl
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *SUITES, "-x", "-q"],
        cwd=str(REPO),
        env=env,
    )
    return proc.returncode == 0


def write_parity_md(records: list, passed: bool, path: Path) -> None:
    fs2 = next((r for r in records if r["test"] == "fs2_teacher_forced"), None)
    imp = next((r for r in records if r["test"] == "reference_import"), None)
    rank_o = next((r for r in records if r["test"] == "rank_outputs"), None)
    rank_l = next((r for r in records if r["test"] == "rank_loss"), None)

    lines = [
        "# PARITY — numerical parity vs the reference architecture",
        "",
        f"Updated {date.today().isoformat()} by `tools/full_size_parity.py` "
        f"(suites: {'PASS' if passed else 'FAIL'}).",
        "",
        "All gates run twice: at toy dims in the default test suite "
        "(tests/test_fs2_torch_parity.py, tests/test_rank_torch_parity.py, "
        "tests/test_reference_import.py) and at PRODUCTION dims "
        "(d=384, 6+6 layers, FFN=1536, 80 mels, 512x5 postnet, 82-ch "
        "extractor input) via this driver.  Values below are the "
        "production-dims runs.",
        "",
        "## Full-size measured parity",
        "",
        "| Gate | Quantity | Measured | Bound |",
        "|---|---|---|---|",
    ]
    if fs2:
        lines += [
            f"| FS2 torch parity (teacher-forced) | masked mel L1 | "
            f"{fs2['mel_l1']:.2e} | < 1e-4 |",
            f"| FS2 torch parity | postnet mel L1 | "
            f"{fs2['postnet_l1']:.2e} | < 1e-4 |",
            f"| FS2 torch parity | log-duration max abs | "
            f"{fs2['logdur_max_abs']:.2e} | rtol 2e-4 |",
        ]
    if imp:
        lines += [
            f"| Reference-checkpoint import | masked mel L1 | "
            f"{imp['mel_l1']:.2e} | < 1e-4 |",
            f"| Reference-checkpoint import | postnet mel L1 | "
            f"{imp['postnet_l1']:.2e} | < 1e-4 |",
            f"| Reference-checkpoint import | log-duration max abs | "
            f"{imp['logdur_max_abs']:.2e} | < 1e-4 |",
        ]
    if rank_o:
        worst = max(rank_o["max_abs"].items(), key=lambda kv: kv[1])
        lines += [
            f"| RankModel torch parity | worst output max abs "
            f"({worst[0]}) | {worst[1]:.2e} | atol 1e-4 |",
        ]
    if rank_l:
        lines += [
            f"| RankModel loss parity | total-loss rel err | "
            f"{rank_l['rel_err']:.2e} | < 1e-4 |",
        ]
    lines += [
        "",
        "Dims on record: "
        + json.dumps(fs2["dims"] if fs2 else {}),
        "",
        "## Residual risk: reference-stack golden fixtures",
        "",
        "The parity gates above compare against *independent in-repo torch "
        "re-implementations* of the published architectures, plus the "
        "converter round-trip.  The true third-party stack — pyworld's "
        "DIO/StoneMask (`rank_model/audio_util.py:16-20`), SpeechBrain's "
        "mel pipeline (`rank_model/audio_util.py:24-42`), the pretrained "
        "SoundChoice G2P, and the released HiFi-GAN weights — is NOT "
        "installable in this zero-egress environment.  The fixture harness "
        "exists (`tools/make_golden_fixtures.py`, "
        "`tests/test_reference_golden.py`, 4 skipped tests) and should be "
        "run the moment an environment offers those deps.  Until then:",
        "",
        "- mel extraction is bit-checked against `torch.stft` (same math "
        "  SpeechBrain wraps), not SpeechBrain itself;",
        "- F0 is cross-checked C++ vs numpy between two in-repo DIO "
        "  implementations, not against pyworld;",
        "- G2P quality is measured against the bundled lexicon's held-out "
        "  split, not against SoundChoice outputs;",
        "- HiFi-GAN import is verified structurally (converter "
        "  round-trips, upsample-factor validation) on synthetic "
        "  checkpoints, not the released weights.",
        "",
        "These four comparisons remain unproven claims about third-party "
        "numerics, and are the first thing to close in a network-enabled "
        "environment.",
    ]
    path.write_text("\n".join(lines) + "\n")


def main() -> int:
    out_jsonl = os.path.join(tempfile.mkdtemp(), "parity.jsonl")
    passed = run_full_suites(out_jsonl)
    records = []
    if os.path.exists(out_jsonl):
        with open(out_jsonl) as f:
            records = [json.loads(ln) for ln in f if ln.strip()]
    write_parity_md(records, passed, REPO / "PARITY.md")
    print(f"PARITY.md written ({len(records)} records, passed={passed})")
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
