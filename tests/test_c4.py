"""C4 cleaning rules (textstats.c4_signals) — Raffel et al. 2020 §2.2."""

from pyspark.sql import functions as F

from paddle_spark.operators.textstats import c4_signals


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in c4_signals(df, **kw).collect()}


def test_line_rules(spark):
    text = "\n".join([
        "this first line has plenty of words and ends properly.",   # keep
        "no terminal punctuation here at all",                      # drop
        "short line.",                                              # drop <5 words
        "please enable javascript to continue reading this page.",  # drop js
        'he said "this quoted line has enough words to survive"',   # keep "
        "   padded line with five whole words inside it!   ",       # keep (trimmed)
    ])
    got = _run(spark, [(0, text)])[0]
    assert got["n_lines"] == 6
    assert got["n_kept_lines"] == 3
    kept = got["kept_text"].split("\n")
    assert kept[0].startswith("this first") and kept[1].startswith("he said")
    # original (untrimmed) line text is preserved in kept_text
    assert kept[2] == "   padded line with five whole words inside it!   "


def test_page_rules(spark):
    three = ("one good sentence with enough words right here.\n"
             "two good sentences with enough words right here.\n"
             "three good sentences with enough words right here.")
    rows = [
        (0, three),                                    # keep
        (1, three + "\nvar x = {1}"),                  # brace -> drop
        (2, three + "\nLorem Ipsum dolor sit amet."),  # lorem (cased) -> drop
        (3, three + "\nan OBSCENE word appears here."),# blocklist -> drop
        (4, "only two sentences. right here!"),        # <3 sentences -> drop
    ]
    got = _run(spark, rows)
    assert got[0]["c4_keep"] is True
    assert got[1]["has_brace"] and not got[1]["c4_keep"]
    assert got[2]["has_lorem"] and not got[2]["c4_keep"]
    assert got[3]["has_badword"] and not got[3]["c4_keep"]
    assert got[4]["n_sentences"] == 2 and not got[4]["c4_keep"]


def test_custom_blocklist(spark):
    text = "a perfectly clean sentence with enough words to stay."
    base = _run(spark, [(0, text)], badwords=["clean"])[0]
    assert base["has_badword"] and not base["c4_keep"]
    off = _run(spark, [(0, text)], badwords=[])[0]
    assert not off["has_badword"]


def test_plan_map_only_no_udf(spark):
    df = spark.createDataFrame([(0, "x.")], "doc_id long, text string")
    plan = c4_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
