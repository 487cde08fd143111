"""Ports dashboard_utils_test.py onto the SVG dashboard composer."""

import io

import pytest

from deepvariant_tpu.tools import dashboard


def sample_chart():
    return dashboard.LineChart([1, 2], [10, 20], title="sample")


class TestCreateHtmlReport:
    def test_create_html_report(self):
        specs = [
            {"id": "my_chart_name", "chart": sample_chart()},
            {"id": "some_html", "html": "<h2>SOME HTML</h2>"},
        ]
        out = io.StringIO()
        dashboard.create_html_report(
            specs=specs,
            html_output=out,
            title="my fancy title",
            subtitle="my fancy subtitle",
            include_outline=True,
        )
        html = out.getvalue()
        assert "my_chart_name" in html
        assert "polyline" in html  # chart markup present
        assert "my fancy title" in html
        assert "my fancy subtitle" in html
        assert "<h2>SOME HTML</h2>" in html
        assert '<a name="a_my_chart_name">' in html
        assert '#a_my_chart_name' in html  # outline links to anchor

    def test_throws_error_on_wrong_input_format(self):
        with pytest.raises(
            ValueError, match='item #1 in specs list does not have an "id" key'
        ):
            dashboard.create_html_report(
                [{"chart": sample_chart()}], html_output=io.StringIO()
            )
        with pytest.raises(
            ValueError, match="item #1 in specs list is not a dictionary."
        ):
            dashboard.create_html_report(
                [sample_chart()], html_output=io.StringIO()
            )

    def test_chart_error_is_contained(self):
        class Broken:
            def to_html(self):
                raise RuntimeError("boom")

        out = io.StringIO()
        dashboard.create_html_report(
            [{"id": "bad", "chart": Broken()}], html_output=out
        )
        assert "Error making chart for bad" in out.getvalue()

    def test_separate_lines_toggles_block_layout(self):
        out = io.StringIO()
        dashboard.create_html_report(
            [{"id": "c", "chart": sample_chart()}],
            html_output=out,
            charts_on_separate_lines=True,
        )
        assert "chart-container block" in out.getvalue()


class TestCharts:
    def test_bar_chart_renders_all_bars(self):
        html = dashboard.BarChart(
            ["a", "b", "c"], [1, 2, 3], title="bars"
        ).to_html()
        assert html.count("<rect") == 3
        assert "bars" in html

    def test_bar_chart_empty(self):
        assert "no data" in dashboard.BarChart([], [], title="t").to_html()

    def test_table_escapes_cells(self):
        html = dashboard.Table(["col<1>"], [["<script>"]]).to_html()
        assert "&lt;script&gt;" in html and "col&lt;1&gt;" in html

    def test_line_chart_constant_y_does_not_divide_by_zero(self):
        html = dashboard.LineChart([0, 1, 2], [5, 5, 5]).to_html()
        assert "polyline" in html
