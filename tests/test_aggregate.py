"""Seed-grid results aggregation (python -m menghini_neurips23_tpu.aggregate).

The reference's tables are 5-seed means (reference README.md:132-174) of the
JSONL lines store_results appends (utils/compute_metrics.py:58-103); the
aggregator must reproduce that math over our (schema-shared) results files.
"""

import json

import numpy as np
import pytest

from menghini_neurips23_tpu import aggregate as agg_mod


def _line(model, paradigm, seed, **metrics):
    return json.dumps(
        {
            "model": model,
            "config": {
                "DATASET_NAME": "EuroSAT",
                "LEARNING_PARADIGM": paradigm,
                "MODEL": model,
                "VIS_ENCODER": "ViT-B/32",
                "SPLIT_SEED": 500,
                "OPTIM_SEED": seed,
            },
            **metrics,
        }
    )


def _write_results(tmp_path):
    accs = [81.0, 83.5, 79.9]
    (tmp_path / "results_model_textual_fpl.json").write_text(
        "\n".join(
            _line("textual_fpl", "ssl", s, accuracy=a)
            for s, a in zip([1, 2, 3], accs)
        )
        + "\n"
    )
    (tmp_path / "results_model_multimodal_fpl.json").write_text(
        _line(
            "multimodal_fpl", "trzsl", 1,
            harmonic_mean=70.0, seen_accuracy=80.0, unseen_accuracy=62.2,
        )
        + "\n"
    )
    return accs


def test_mean_std_across_seeds(tmp_path, capsys):
    accs = _write_results(tmp_path)
    agg = agg_mod.main([str(tmp_path), "--format", "json"])
    out = {e["MODEL"]: e for e in agg}
    ssl = out["textual_fpl"]
    assert ssl["n_runs"] == 3 and ssl["seeds"] == [1, 2, 3]
    assert ssl["metrics"]["accuracy"]["mean"] == pytest.approx(np.mean(accs))
    assert ssl["metrics"]["accuracy"]["std"] == pytest.approx(np.std(accs))
    trz = out["multimodal_fpl"]
    assert set(trz["metrics"]) == {"harmonic_mean", "seen_accuracy", "unseen_accuracy"}
    assert trz["metrics"]["harmonic_mean"]["std"] == 0.0
    # stdout is valid JSON of the same aggregate
    assert json.loads(capsys.readouterr().out) == agg


def test_md_and_csv_formats(tmp_path, capsys):
    _write_results(tmp_path)
    agg_mod.main([str(tmp_path)])
    md = capsys.readouterr().out
    assert "| EuroSAT | ssl | textual_fpl | ViT-B/32 | 500 | 3 |" in md
    assert "81.47 ± 1.51" in md  # mean/std of the 3 accuracies

    out_csv = tmp_path / "agg.csv"
    agg_mod.main([str(tmp_path), "--format", "csv", "--output", str(out_csv)])
    lines = out_csv.read_text().splitlines()
    assert lines[0].startswith("dataset,paradigm,model")
    assert any(l.startswith("EuroSAT,ssl,textual_fpl,ViT-B/32,500,3,accuracy") for l in lines)


def test_explicit_file_and_dir_dedup(tmp_path):
    _write_results(tmp_path)
    f = tmp_path / "results_model_textual_fpl.json"
    # passing the dir AND a file inside it must not double-count runs
    agg = agg_mod.main([str(tmp_path), str(f), "--format", "json"])
    assert {e["MODEL"]: e["n_runs"] for e in agg} == {
        "textual_fpl": 3, "multimodal_fpl": 1,
    }


def test_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        agg_mod.collect_files([str(tmp_path / "missing")])
    empty = tmp_path / "emptydir"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        agg_mod.collect_files([str(empty)])
    bad = tmp_path / "results_model_x.json"
    bad.write_text("not json\n")
    with pytest.raises(ValueError):
        agg_mod.load_rows([bad])


def _grip_line(seed, acc, paradigm="ssl", dataset="MNIST", model="grip_textual",
               metric="accuracy"):
    return json.dumps(
        {
            "model": model,
            "config": {
                "DATASET_NAME": dataset,
                "LEARNING_PARADIGM": paradigm,
                "MODEL": model,
                "VIS_ENCODER": "ViT-B/32",
                "SPLIT_SEED": 500,
                "OPTIM_SEED": seed,
            },
            metric: acc,
        }
    )


def test_baseline_gate_pass_and_fail(tmp_path):
    # reference grip_textual MNIST ssl = 71.8; ours at 71.6 mean -> within 0.3
    (tmp_path / "results_model_grip_textual.json").write_text(
        "\n".join(_grip_line(s, a) for s, a in zip([1, 2], [0.715, 0.717])) + "\n"
    )
    agg = agg_mod.aggregate(
        agg_mod.load_rows(agg_mod.collect_files([str(tmp_path)]))
    )
    cells = agg_mod.compare_to_baseline(agg, budget=0.3)
    assert len(cells) == 1 and cells[0]["status"] == "PASS"
    assert cells[0]["reference_pct"] == 71.8
    # a clearly-low mean FAILs
    cells = agg_mod.compare_to_baseline(agg, budget=0.01)
    assert cells[0]["status"] == "FAIL"


def test_baseline_gate_trzsl_uses_harmonic_mean(tmp_path):
    # reference grip_textual EuroSAT trzsl = 92.3 (harmonic mean)
    (tmp_path / "results_model_grip_textual.json").write_text(
        _grip_line(1, 0.925, paradigm="trzsl", dataset="EuroSAT",
                   metric="harmonic_mean") + "\n"
    )
    agg = agg_mod.aggregate(
        agg_mod.load_rows(agg_mod.collect_files([str(tmp_path)]))
    )
    cells = agg_mod.compare_to_baseline(agg)
    assert cells and cells[0]["metric"] == "harmonic_mean"
    assert cells[0]["status"] == "PASS"


def test_baseline_gate_cli_strict(tmp_path, capsys):
    (tmp_path / "results_model_grip_textual.json").write_text(
        _grip_line(1, 0.10) + "\n"  # far below 71.8 -> strict exit 1
    )
    with pytest.raises(SystemExit):
        agg_mod.main([str(tmp_path), "--baseline", "--strict"])
    out = capsys.readouterr().out
    assert "FAIL" in out and "71.8" in out


def test_baseline_json_and_csv_stay_machine_readable(tmp_path, capsys):
    """--baseline must not corrupt the machine-readable formats: json carries
    the gate as part of one parseable object; csv stays one table (the gate
    goes to stderr for the human)."""
    (tmp_path / "results_model_grip_textual.json").write_text(
        _grip_line(1, 0.715) + "\n"
    )
    out_json = tmp_path / "agg.json"
    agg_mod.main([str(tmp_path), "--format", "json", "--baseline",
                  "--output", str(out_json)])
    payload = json.loads(out_json.read_text())  # must parse cleanly
    assert payload["baseline_gate"]["budget"] == 0.3
    assert payload["baseline_gate"]["cells"][0]["status"] == "PASS"
    assert payload["aggregate"]

    out_csv = tmp_path / "agg.csv"
    agg_mod.main([str(tmp_path), "--format", "csv", "--baseline",
                  "--output", str(out_csv)])
    lines = out_csv.read_text().splitlines()
    assert lines[0].startswith("dataset,paradigm,model")
    assert all(l.count(",") == lines[0].count(",") for l in lines if l)
    assert "| MNIST | ssl | grip_textual |" in capsys.readouterr().err


def test_baseline_tables_cover_all_published_cells():
    tables = agg_mod.load_baseline_tables()
    datasets = {"Flowers102", "RESICS45", "FGVCAircraft", "MNIST", "EuroSAT", "DTD"}
    for model in ("clip_baseline", "grip_textual", "grip_visual", "grip_multimodal"):
        assert set(tables[model]) == datasets
        for ds in datasets:
            assert set(tables[model][ds]) == {"ssl", "ul", "trzsl"}, (model, ds)
    for model in ("textual_prompt", "visual_prompt", "multimodal_prompt"):
        for ds in datasets:
            # supervised baselines publish no UL column
            assert set(tables[model][ds]) == {"ssl", "trzsl"}, (model, ds)
