"""Tests for the mechanized draw-stable perf-weak criterion
(`tools/paired_ratio.py --weak`, r13): membership from per-entry
MEDIANS across sittings, gate + sub-second-q-entry exclusions, and
the oracle floor-band annotation.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import paired_ratio  # noqa: E402


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries}))
    return str(p)


def _run_weak(tmp_path, capsys, sittings, batch=None):
    """sittings: list of (spark_queries, duck_queries) dicts.
    ``batch``: optional list of batch names, one per sitting, to
    exercise the filename-recovered batch grouping (default: each
    sitting its own batch, the conservative fallback)."""
    pairs = []
    for i, (s, d) in enumerate(sittings):
        stem = f"{batch[i]}_s{i}" if batch else f"s{i}"
        dstem = f"{batch[i]}_d{i}" if batch else f"d{i}"
        pairs.append(
            (
                _write(tmp_path, f"{stem}.json", s),
                _write(tmp_path, f"{dstem}.json", d),
            )
        )
    paired_ratio._weak_set(pairs)
    return capsys.readouterr().out


def _members_section(out):
    """Lines of the perf-weak member list (before any watch
    section)."""
    return out.split("— boundary watch")[0]


def _watch_section(out):
    parts = out.split("— boundary watch")
    return parts[1] if len(parts) > 1 else ""


def test_median_membership_absorbs_single_batch_boundary(
    tmp_path, capsys
):
    """An entry over 2x in ONE sitting but under at the median stays
    out — the mixing_controls boundary case the criterion exists
    for."""
    s1 = {"mixing_controls": 0.54, "ngram_jaccard_pairs": 1.6}
    d1 = {"mixing_controls": 0.25, "ngram_jaccard_pairs": 0.35}
    s2 = {"mixing_controls": 0.45, "ngram_jaccard_pairs": 1.5}
    d2 = {"mixing_controls": 0.26, "ngram_jaccard_pairs": 0.36}
    s3 = {"mixing_controls": 0.46, "ngram_jaccard_pairs": 1.55}
    d3 = {"mixing_controls": 0.27, "ngram_jaccard_pairs": 0.34}
    out = _run_weak(tmp_path, capsys, [(s1, d1), (s2, d2), (s3, d3)])
    members = _members_section(out)
    assert "ngram_jaccard_pairs" in members
    # median spark 0.46 vs duck 0.26 → under both the 0.5 s and 2×
    # lines at the medians despite sitting 1 reading 2.2× — NOT a
    # member; r14: the excursion surfaces on the boundary watch
    # instead of disappearing silently
    assert "mixing_controls" not in members
    assert "mixing_controls" in _watch_section(out)


def test_floor_band_annotation_and_exclusions(tmp_path, capsys):
    s = {
        "sessionize_events": 0.6,  # oracle in the floor band
        "decontaminate_train": 0.9,  # oracle above the band
        "q1_pricing_summary": 0.7,  # sub-second q-entry: excluded
        "sketch_quality_gates": 4.0,  # gate entry: excluded
        "tiny_entry": 0.3,  # under the 0.5 s spark line
    }
    d = {
        "sessionize_events": 0.11,
        "decontaminate_train": 0.29,
        "q1_pricing_summary": 0.07,
        "sketch_quality_gates": 0.14,
        "tiny_entry": 0.01,
    }
    out = _run_weak(tmp_path, capsys, [(s, d)])
    assert "sessionize_events" in out and "floor band" in out
    # the above-band member is listed WITHOUT the annotation
    decont_line = next(
        ln for ln in out.splitlines() if "decontaminate_train" in ln
    )
    assert "floor band" not in decont_line
    assert "q1_pricing_summary" not in out
    assert "sketch_quality_gates" not in out
    assert "tiny_entry" not in out


def test_big_q_entry_is_not_excluded(tmp_path, capsys):
    """The q-entry exclusion is only for the sub-second scheduling
    floor — a q-entry with real measured work stays eligible."""
    s = {"q1_pricing_summary": 2.5}
    d = {"q1_pricing_summary": 0.5}
    out = _run_weak(tmp_path, capsys, [(s, d)])
    assert "q1_pricing_summary" in out


def test_q_exclusion_is_literal_allow_list(tmp_path, capsys):
    """r14 (r13-verdict ask #5): the exclusion is the LITERAL
    three-entry list, not a name shape — a hypothetical sub-second
    ``q2norm_*`` entry doing real work is NOT excluded (this test is
    red on the old q+digit prefix heuristic, which would have
    silently dropped it)."""
    s = {"q2norm_embeddings": 0.8, "q1_pricing_summary": 0.7}
    d = {"q2norm_embeddings": 0.1, "q1_pricing_summary": 0.07}
    out = _run_weak(tmp_path, capsys, [(s, d)])
    assert "q2norm_embeddings" in _members_section(out)
    assert "q1_pricing_summary" not in out
    assert paired_ratio.RELATIONAL_FLOOR_ENTRIES == {
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_nation_revenue",
    }


def test_worst_batch_column_and_batch_grouping(tmp_path, capsys):
    """r14 (r13 ADVICE): members show their worst per-batch median
    ratio — the unfavorable-draw EXIT reading — with batches
    recovered from the archive filenames."""
    # batch a: 1.6/0.5 = 3.2x; batch b: 2.4/0.5 = 4.8x
    sittings = [
        ({"lm_perplexity": 1.6}, {"lm_perplexity": 0.5}),
        ({"lm_perplexity": 1.6}, {"lm_perplexity": 0.5}),
        ({"lm_perplexity": 2.4}, {"lm_perplexity": 0.5}),
        ({"lm_perplexity": 2.4}, {"lm_perplexity": 0.5}),
    ]
    out = _run_weak(
        tmp_path, capsys, sittings, batch=["ra", "ra", "rb", "rb"]
    )
    line = next(
        ln for ln in out.splitlines() if "lm_perplexity" in ln
    )
    assert "worst-batch 4.8x (rb)" in line
    assert "2 batches" in out


def test_mispaired_batch_warns(tmp_path, capsys):
    """r15 (r14 ADVICE): a duck record whose filename recovers a
    DIFFERENT batch than its spark partner is flagged, instead of
    its timings being silently attributed to the spark file's batch
    in the worst-batch column."""
    s1 = _write(tmp_path, "ra_s1.json", {"lm_perplexity": 1.6})
    d1 = _write(tmp_path, "rb_d1.json", {"lm_perplexity": 0.5})
    paired_ratio._weak_set([(s1, d1)])
    out = capsys.readouterr().out
    assert "WARNING" in out and "mispaired" in out
    # correctly-paired files stay silent
    s2 = _write(tmp_path, "ra_s2.json", {"lm_perplexity": 1.6})
    d2 = _write(tmp_path, "ra_d2.json", {"lm_perplexity": 0.5})
    paired_ratio._weak_set([(s2, d2)])
    assert "WARNING" not in capsys.readouterr().out


def test_empty_set_prints_empty(tmp_path, capsys):
    out = _run_weak(
        tmp_path, capsys, [({"a_entry": 0.4}, {"a_entry": 0.3})]
    )
    assert "(empty)" in out
