"""Script-level utilities: log aggregator format contract
(reference scripts/average_log.py:12-60 scrapes log.txt)."""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_log_matches_trainer_format(tmp_path):
    # exactly the line the Trainer emits at each eval
    log = tmp_path / "log.txt"
    log.write_text(
        "[09:00:00 INFO] eval @ 2: top-1-acc=0.7100 balanced_acc=0.2500 "
        "precision=0.0771 recall=0.2500 F1=0.1179 loss=19.19 "
        "(best 0.7200 @ 2)\n"
        "[09:00:05 INFO] eval @ 4: top-1-acc=0.7300 (best 0.7300 @ 4)\n")
    al = _load("average_log")
    best, accs = al.parse_log(str(log))
    assert best == 0.73
    assert accs == [0.71, 0.73]


def test_metrics_sink_jsonl(tmp_path):
    """MetricsSink writes one JSON object per log call (the structured
    replacement for the reference's TBLog/log.txt scraping)."""
    import json
    from semireward_tpu.utils.metrics_sink import MetricsSink

    sink = MetricsSink(str(tmp_path), run_name="t", config={"lr": 0.1})
    sink.log({"train/total_loss": 1.5, "lr": 0.01}, step=10)
    sink.log({"eval/top-1-acc": 0.9}, step=20)
    sink.close()
    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl").read().splitlines() if ln]
    assert any(r.get("step") == 10 and r.get("train/total_loss") == 1.5
               for r in lines)
    assert any(r.get("step") == 20 for r in lines)


def test_preprocess_nlp_chain(tmp_path):
    """preprocess_nlp.py emits the reference JSON contract
    ('ori'/'aug_0'/'aug_1'/'label') and the NLP loader consumes it."""
    import json
    import os
    import subprocess
    import sys

    for split in ("train", "test"):
        for sub, label in (("pos", 1), ("neg", 0)):
            d = tmp_path / "raw" / split / sub
            os.makedirs(d)
            for i in range(3):
                (d / f"{i}.txt").write_text(
                    f"sample text number {i} for {sub} {split}")
    out = subprocess.run(
        [sys.executable, "preprocess/preprocess_nlp.py", "--dataset",
         "aclImdb", "--raw", str(tmp_path / "raw"), "--out",
         str(tmp_path / "data" / "aclImdb")],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert out.returncode == 0, out.stderr[-1000:]

    d = json.load(open(tmp_path / "data" / "aclImdb" / "train.json"))
    row = d[next(iter(d))]
    assert set(row) == {"ori", "aug_0", "aug_1", "label"}

    import semireward_tpu as st
    from semireward_tpu.data.nlp import get_nlp_dataset
    cfg = st.get_config(dict(algorithm="fixmatch", dataset="aclImdb",
                             num_classes=2, num_labels=2,
                             data_dir=str(tmp_path / "data"),
                             net="bert_base_uncased"))
    splits = get_nlp_dataset(cfg, "fixmatch")
    assert len(splits["train_lb"]) == 2
    assert len(splits["test"]) == 6


def test_preprocess_audio_chain(tmp_path):
    """preprocess_audio.py: ESC-50 fold layout -> {train,dev,test}.pkl lists
    of (float32 wave, label) — the layout data/audio.py loads."""
    import csv
    import os
    import pickle
    import subprocess
    import sys

    import numpy as np
    from scipy.io import wavfile

    audio = tmp_path / "raw" / "audio"
    meta = tmp_path / "raw" / "meta"
    os.makedirs(audio); os.makedirs(meta)
    rs = np.random.RandomState(0)
    with open(meta / "esc50.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "fold", "target"])
        w.writeheader()
        for i in range(10):
            fn = f"clip{i}.wav"
            wavfile.write(str(audio / fn), 16000,
                          (rs.randn(8000) * 1000).astype(np.int16))
            w.writerow({"filename": fn, "fold": (i % 5) + 1, "target": i % 3})
    out = subprocess.run(
        [sys.executable, "preprocess/preprocess_audio.py", "--dataset",
         "esc50", "--raw", str(tmp_path / "raw"), "--out",
         str(tmp_path / "data")],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert out.returncode == 0, out.stderr[-1000:]
    train = pickle.load(open(tmp_path / "data" / "train.pkl", "rb"))
    assert len(train) == 6  # folds 1-3
    wav, label = train[0]
    assert wav.dtype == np.float32 and 0 <= label < 3


def test_examples_run(tmp_path):
    """examples/*.py (the reference notebooks' flows) run end to end."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    for script in ("examples/beginner.py", "examples/custom_dataset.py",
                   "examples/custom_algorithm.py"):
        out = subprocess.run([sys.executable, os.path.join(REPO, script)],
                             capture_output=True, text=True, timeout=600,
                             env=env, cwd=str(tmp_path))
        assert out.returncode == 0, (script, out.stderr[-1500:])
        assert "top-1-acc" in out.stdout


def _load_mknb():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mknb", os.path.join(REPO, "scripts", "make_notebooks.py"))
    mknb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mknb)
    return mknb


def test_notebooks_in_sync():
    """notebooks/*.ipynb cell SOURCES are generated from examples/*.py —
    regeneration must be a no-op up to executed outputs
    (scripts/make_notebooks.py is the sync tool)."""
    import json

    mknb = _load_mknb()
    for py, nb in mknb.PAIRS.items():
        with open(os.path.join(REPO, py)) as f:
            cells = mknb.parse_percent_cells(f.read())
        want = mknb.to_notebook(cells)["cells"]
        with open(os.path.join(REPO, nb)) as f:
            got = json.load(f)["cells"]
        assert [c["source"] for c in got] == [c["source"] for c in want], \
            f"{nb} out of sync with {py}"
        assert [c["cell_type"] for c in got] == \
            [c["cell_type"] for c in want]
        # tutorial depth: a real multi-cell walkthrough, not a 2-cell shell
        assert sum(1 for c in got if c["cell_type"] == "markdown") >= 4, nb
        assert sum(1 for c in got if c["cell_type"] == "code") >= 3, nb


def test_notebooks_committed_with_executed_outputs():
    """The shipped notebooks carry EXECUTED output cells (the reference's
    walkthroughs show results; `make_notebooks.py --execute` regenerates
    them)."""
    import json

    mknb = _load_mknb()
    for nb in mknb.PAIRS.values():
        with open(os.path.join(REPO, nb)) as f:
            cells = json.load(f)["cells"]
        outs = [o for c in cells if c["cell_type"] == "code"
                for o in c.get("outputs", [])]
        text = "".join("".join(o.get("text", [])) for o in outs)
        assert outs, f"{nb}: no executed outputs"
        assert "top-1-acc" in text or "eval/" in text, f"{nb}: {text[:200]}"


def test_quality_artifacts_median_gain_contract():
    """Executable form of the benchmark contract (VERDICT r2 item 1 done
    -criterion): across the committed 3-seed QUALITY_r03 artifacts, every
    SSL family's median gain vs the labeled-only baseline is positive.
    The artifacts are produced on TPU by scripts/golden_quality.py; this
    test keeps the contract enforced (a regenerated artifact with a
    regressed family fails CI), while the runs themselves live in the
    golden tier."""
    import json
    import statistics

    reports = []
    for name in ("QUALITY_r03.json", "QUALITY_r03_seed1.json",
                 "QUALITY_r03_seed2.json",
                 # the round-4 3-seed regeneration obeys the same contract
                 "QUALITY_r04.json", "QUALITY_r04_seed1.json",
                 "QUALITY_r04_seed2.json"):
        with open(os.path.join(REPO, name)) as f:
            reports.append(json.load(f))
    fams = lambda r: {**r.get("thresholding_families", {}),
                      **r.get("other_families", {})}
    names = sorted(fams(reports[0]))
    assert len(names) == 17
    for alg in names:
        gains = [fams(r)[alg]["gain_vs_labeled_only"] for r in reports]
        med = statistics.median(gains)
        assert med > 0, f"{alg}: 3-seed gains {gains}, median {med}"
    # SemiReward uniform-noise filtering: positive at every committed seed
    sr_gains = [r["semireward_noise"]["sr_gain"] for r in reports]
    assert all(g > 0 for g in sr_gains), sr_gains


def test_bench_flops_accounting_split_forward():
    """bench.py's MFU basis counts EXECUTED FLOPs: rows whose backward
    never runs (the stop-graded weak ulb view, via use_cat=False or the
    split-forward path) must not be billed backward work."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # WRN: bwd ~= 2x fwd; forward-only rows pay 1x
    assert bench.wrn_step_flops(1.0, 24) == 3.0 * 24
    assert bench.wrn_step_flops(1.0, 24, images_bwd=16) == 24 + 2.0 * 16

    # ViT: full = fwd(2PN) + bwd(4PN) per image (+ attn terms); the split
    # form must equal full minus the weak rows' bwd share exactly
    full = bench.vit_step_flops(1e6, tokens=257, images=24, hidden=384,
                                layers=12)
    split = bench.vit_step_flops(1e6, tokens=257, images=24, hidden=384,
                                 layers=12, images_bwd=16)
    per_img_bwd = 4.0 * 1e6 * 257 + 12.0 * (257 * 257 * 384 * 12)
    assert abs((full - split) - 8 * per_img_bwd) / full < 1e-12
