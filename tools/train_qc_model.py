"""Train and FREEZE the quality-classifier model the driver gate
scores with (r12, r11-verdict #5: a score-only classifier row — the
r9 declination priced TRAINING at 2-4 s/rep; a frozen,
disk-round-tripped PipelineModel scoring a bounded probe set is
map-only and its outputs are pure constants, the BPE-vocab
precedent).

Writes the fitted ``PipelineModel`` to
``serverless_data_lake_spark/operators/qc_model/`` (committed — ml
persistence format: JSON metadata + tiny coefficient parquet) and
prints the probe scores to paste into ``_QC_PROBES`` in
``__spark_entry__.py``. The labeled set is FIXED literals below:
retraining with the same file reproduces the same decision boundary
up to float-sum order; any change to the tokenizer, hashing, or
labeled set shifts the frozen scores and the gate fails loudly —
that is the point.

Usage: python tools/train_qc_model.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Positives: reference-quality prose. Negatives: crawl junk —
# boilerplate, keyword stuffing, navigation chrome, gibberish.
POSITIVES = [
    "The committee published its findings after a two year review of "
    "the evidence, concluding that the policy had measurable effects "
    "on regional employment and wages.",
    "In the opening chapter the author traces the river from its "
    "glacial source to the delta, pausing at each settlement to "
    "record how the water shaped local trade.",
    "Researchers compared the two treatments in a randomized trial "
    "and found a small but consistent improvement in recovery time "
    "among patients receiving the combination therapy.",
    "The museum's new wing houses a collection of early printed maps, "
    "each annotated with the surveyor's original marginal notes.",
    "Her letters from that winter describe the harbor freezing over "
    "and the fishermen hauling their boats onto the ice to mend nets.",
    "The court held that the statute applied only to contracts signed "
    "after the effective date, reversing the lower court's broader "
    "reading.",
    "A gradual rise in soil salinity forced farmers in the valley to "
    "switch from wheat to barley over the course of a decade.",
    "The orchestra rehearsed the slow movement twice, the conductor "
    "asking the strings to soften their entry until it was barely "
    "audible.",
    "Engineers traced the outage to a corroded junction box and "
    "replaced the affected cabling before restoring service to the "
    "northern grid.",
    "The biography devotes three chapters to the years in exile, "
    "drawing on newly opened archives and interviews with surviving "
    "correspondents.",
]
NEGATIVES = [
    "click here click here best deals best deals buy now buy now "
    "free shipping free shipping limited offer limited offer",
    "home about contact login register home about contact login "
    "register sitemap privacy terms cookies sitemap privacy terms",
    "cheap watches cheap watches replica watches discount watches "
    "luxury watches cheap cheap cheap watches watches watches",
    "lorem ipsum dolor sit amet lorem ipsum dolor sit amet lorem "
    "ipsum dolor sit amet lorem ipsum dolor",
    "qwkje zxnvm plorf gkkrt wzzqp mnbvd hjkls aqwse plmok ijnuh "
    "qazwsx edcrfv tgbyhn ujmikl",
    "404 not found page not found error 404 the page you requested "
    "was not found try again 404 error not found",
    "tags: free download crack keygen serial torrent rapidshare "
    "megaupload hotfile mediafire full version no survey",
    "next page previous page page 1 page 2 page 3 page 4 page 5 "
    "next previous first last jump to page",
    "win big win big casino bonus casino bonus no deposit free spins "
    "jackpot slots poker bet now win big bonus",
    "subscribe newsletter email address submit subscribe follow us "
    "facebook twitter instagram youtube subscribe like share",
]

# Probe strings the gate scores every run. The quality/junk probes
# are HELD-OUT SENTENCES RECOMBINED FROM THE TRAINING VOCABULARY
# (none is a training document): a 20-doc hashed-BoW model has no
# weights for unseen words, so fully-novel text scores at the prior
# — the recombined probes make the >0.5/<0.5 side gates meaningful
# while still not being memorized rows. The unseen-vocab probe pins
# exactly that prior behavior (metric pin only, plus a <0.5 side
# gate: the crawl-heavy prior must not pass junk).
PROBES = [
    ("quality_recombined",
     "the committee reviewed the evidence from the archives and "
     "published its findings on trade and employment in the valley"),
    ("junk_recombined",
     "click here buy now free shipping best deals subscribe "
     "newsletter follow us casino bonus free spins"),
    ("junk_unseen_gibberish",
     "zxqwv plmnk ajsdh qwerty zxcvb poiuy lkjhg mnbvc xswza qazxs"),
    ("quality_recombined_2",
     "researchers compared the treatments and the court held that "
     "the findings applied to patients in the trial"),
    ("junk_recombined_2",
     "home about contact login register page 1 page 2 next previous "
     "sitemap privacy terms error 404 not found"),
]


def main() -> None:
    from serverless_data_lake_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from serverless_data_lake_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    labeled = spark.createDataFrame(
        [(1.0, t) for t in POSITIVES] + [(0.0, t) for t in NEGATIVES],
        "label double, text string",
    ).coalesce(1)  # single partition: stable float-sum order
    model = train_quality_classifier(
        labeled, num_features=1 << 15, reg_param=1e-3, max_iter=100
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "serverless_data_lake_spark", "operators", "qc_model",
    )
    shutil.rmtree(out, ignore_errors=True)
    model.write().save(out)
    # CRC sidecar files are checksum noise in a committed artifact
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".crc") or f == "_SUCCESS":
                os.remove(os.path.join(root, f))
    print(f"model saved to {out}")
    probes = spark.createDataFrame(PROBES, "key string, text string")
    for r in score_quality(probes, model).collect():
        print(f'    ("{r["key"]}", {round(r["quality_prob"], 6)}),')


if __name__ == "__main__":
    main()
