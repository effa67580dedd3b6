"""prepare_training_data pipeline stages — the host/section spam gate
drops whole mirror sections before doc-level dedup."""

import sys

import numpy as np
import pandas as pd


def test_section_gate_drops_spam_section(spark, tmp_path):
    sys.modules.pop("jobs.prepare_training_data", None)
    from jobs.prepare_training_data import main

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(200)]
    rows = []
    spam_text = b"dup dup " + b" ".join(b"spam%d" % i for i in range(30))
    for i in range(12):  # mirror farm: one body, many urls
        rows.append((f"https://spam.example.com/en/p{i}", "en", spam_text))
    for i in range(10):  # healthy section: distinct bodies
        body = " ".join(rng.choice(words, 40))
        rows.append((f"https://ok.example.com/en/p{i}", "en", body.encode()))
    pdf = pd.DataFrame(rows, columns=["url", "lang", "html"])
    pdf["warc_ts"] = pd.Timestamp("2024-01-01")
    inp = str(tmp_path / "in")
    spark.createDataFrame(pdf).write.parquet(inp)

    out = str(tmp_path / "out")
    rc = main([
        "--input", inp, "--out", out, "--langs", "en",
        "--min-tokens", "5", "--max-section-dup-rate", "0.5",
    ])
    assert rc == 0
    clean = spark.read.parquet(f"{out}/clean").select("url").toPandas()["url"]
    assert not any(u.startswith("https://spam.") for u in clean)
    assert sum(u.startswith("https://ok.") for u in clean) == 10
