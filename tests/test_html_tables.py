"""HTML table recognition (kernels/html.html_tables + the
html_table_blocks fan-out) — the HTML-modality analog of the PDF
branch's table assembly (kernels/table.py), sharing its markdown
contract (header row, | --- | separator, \\| escaping)."""

from paddle_spark.kernels.html import html_tables
from paddle_spark.operators.blocks import html_table_blocks

PAGE = b"""<html><body><p>intro</p>
<table><tr><th>name</th><th>qty</th></tr>
<tr><td>alpha</td><td>3</td></tr>
<tr><td>beta | gamma</td><td><b>7</b></td></tr></table>
<script>var x = "</table>";</script>
<table class="x"><tr><td>solo</td><td>two</td></tr><tr><td>ragged</td></tr></table>
</body></html>"""


class TestKernel:
    def test_two_tables_in_order(self):
        t = html_tables(PAGE)
        assert len(t) == 2
        assert t[0].split("\n") == [
            "| name | qty |",
            "| --- | --- |",
            "| alpha | 3 |",
            "| beta \\| gamma | 7 |",
        ]

    def test_ragged_rows_pad(self):
        t = html_tables(PAGE)[1]
        assert t.split("\n") == [
            "| solo | two |",
            "| --- | --- |",
            "| ragged |  |",
        ]

    def test_script_island_cannot_truncate(self):
        # the </table> inside the script string must not end table 1
        t = html_tables(PAGE)
        assert "var x" not in "".join(t)

    def test_inner_tags_and_entities_normalize(self):
        t = html_tables(
            b"<table><tr><td> a&amp;b <i>c</i> </td></tr></table>"
        )
        assert t == ["| a&b c |\n| --- |"]

    def test_no_tables_or_garbage(self):
        assert html_tables(b"<p>none</p>") == []
        assert html_tables(b"\x00\xff garbage") == []
        assert html_tables(b"<table><tr></tr></table>") == []


class TestOperator:
    def test_fan_out_rows(self, spark):
        rows = [("u1", PAGE), ("u2", b"<p>no tables</p>"), ("u3", None)]
        df = spark.createDataFrame(rows, "url string, html binary")
        got = sorted(
            (r["url"], r["table_no"], r["table_md"].split("\n")[0])
            for r in html_table_blocks(df).collect()
        )
        assert got == [
            ("u1", 0, "| name | qty |"),
            ("u1", 1, "| solo | two |"),
        ]

    def test_plan_map_only(self, spark):
        df = spark.createDataFrame([("u", b"<p>x</p>")], "url string, html binary")
        plan = (
            html_table_blocks(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
