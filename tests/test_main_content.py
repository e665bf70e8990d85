"""Main-content extraction (functions/extract.py:extract_main_content):
hand-stated block classification, threshold boundaries, reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_lsh_spark.functions.extract import (
    extract_main_content,
    main_content_blocks,
)

_LONG = "this content paragraph has plenty of visible characters"  # 56


def _pages(spark, html: str):
    return spark.createDataFrame([(1, html)], "doc_id long, html string")


def test_block_classification_matrix(spark):
    html = (
        '<div><a href="/1">Home</a> <a href="/2">About</a></div>'  # pure nav
        f"<p>{_LONG}</p>"                                  # good content
        "<p>short line</p>"                                # 10 chars: boiler
        f'<p><a href="/x">see</a> {_LONG}</p>'             # low density: good
        "<ul><li>item one item two item three</li>"        # 28 chars, no link
    )
    rows = {r["pos"]: r for r in
            main_content_blocks(_pages(spark, html)).collect()}
    texts = {r["btxt"]: r for r in rows.values()}
    assert texts["Home About"]["boiler"]          # density 1000
    assert not texts[_LONG]["boiler"]
    assert texts["short line"]["boiler"]          # < 20 chars
    mixed = texts[f"see {_LONG}"]
    # subtractive anchor mass: 'see' plus its separating space = 4 chars
    assert mixed["anchor_chars"] == 4
    assert not mixed["boiler"]
    assert not texts["item one item two item three"]["boiler"]


def test_threshold_boundaries(spark):
    # 19 chars -> boiler, 20 -> good (strict less-than min_chars)
    html = "<p>nineteen charsxxxxx</p><p>exactly twenty chars</p>"
    by_txt = {r["btxt"]: r["boiler"] for r in
              main_content_blocks(_pages(spark, html)).collect()}
    assert by_txt == {"nineteen charsxxxxx": True,
                      "exactly twenty chars": False}
    # per-mille 333 exactly -> good (strict greater-than max_link_pm);
    # one anchor char more -> 354 -> boiler
    html2 = ('<p><a href="/z">ninechars</a> exactly twenty chars</p>'
             '<p><a href="/z">tencharsxx</a> exactly twenty chars</p>')
    rows = sorted(main_content_blocks(_pages(spark, html2)).collect(),
                  key=lambda r: r["pos"])
    assert [r["link_pm"] for r in rows] == [333, 354]
    assert [r["boiler"] for r in rows] == [False, True]


def test_reconstruction_order_and_summary(spark):
    html = (f"<p>{_LONG} one</p>"
            '<div><a href="/1">Home</a> <a href="/2">About</a></div>'
            f"<p>{_LONG} two</p>")
    row = extract_main_content(_pages(spark, html)).collect()[0]
    assert row["n_blocks"] == 3
    assert row["n_boiler"] == 1
    assert row["content"] == f"{_LONG} one {_LONG} two"
    assert row["kept_chars"] == 2 * (len(_LONG) + 4)


def test_empty_and_tag_only_docs(spark):
    # tag-only html yields zero non-empty blocks -> no output row
    assert extract_main_content(
        _pages(spark, "<html><body></body></html>")).count() == 0
    # a doc with only boilerplate keeps an empty content string
    row = extract_main_content(_pages(spark, "<p>tiny</p>")).collect()[0]
    assert (row["n_blocks"], row["n_boiler"], row["kept_chars"],
            row["content"]) == (1, 1, 0, "")


def test_multiline_and_case_insensitive_tags(spark):
    html = f"<P>{_LONG}</P>\n<p>line\nbreak inside a long block here</p>"
    rows = sorted(main_content_blocks(_pages(spark, html)).collect(),
                  key=lambda r: r["pos"])
    assert rows[0]["btxt"] == _LONG  # uppercase close tag splits too
    # the newline survives block text verbatim (html here is synthetic;
    # raw crawls pass through extract_text first)
    assert "break inside" in rows[1]["btxt"]
