"""Drop-in style API facade mirroring the reference's surface.

Reference usage (HTMLParser.js:82-140, README.md:28-241):

    const parser = new HTMLParser({tagNameCasing: "preserve"});
    const nodes = await parser.parseFile("page.html").toArray();
    const nodes2 = await parser.parseString("<div>hi</div>").toArray();

tempeh-spark equivalent (same semantics, byte-identical output):

    parser = HTMLParser(tag_name_casing="preserve")
    nodes = parser.parse_file("page.html").to_array()
    nodes2 = parser.parse_string("<div>hi</div>").to_array()

    # and the distributed form the reference has no analogue for:
    out = parser.parse_dataframe(pages_df)      # adds a `parsed` struct col

Differences by design (SURVEY.md §2 A25/A28): results are re-computable
values, not single-use streams — there is no ``used`` flag; per-node
streaming is replaced by whole-document materialization (Spark rows).
"""

from __future__ import annotations

from pathlib import Path

from tempeh_spark.options import ParserOptions
from tempeh_spark.parser import ParseResult, parse_bytes, parse_string


class HTMLParseHandle:
    """Result handle: iterate root nodes or materialize them (toArray)."""

    def __init__(self, result: ParseResult):
        self._result = result

    @property
    def result(self) -> ParseResult:
        return self._result

    def to_array(self) -> list:
        """The reference's ``toArray()``: the resolved node tree. Raises on
        parse errors, matching the reference's rejected promise."""
        if self._result.error is not None:
            raise ValueError(self._result.error)
        return self._result.nodes

    toArray = to_array  # familiarity alias for reference users

    def __iter__(self):
        return iter(self.to_array())

    @property
    def text(self) -> str:
        return self._result.text

    @property
    def main_text(self) -> str:
        return self._result.main_text

    @property
    def error(self) -> str | None:
        return self._result.error


class HTMLParser:
    """Reference-parity parser facade (plus the Spark-native entry point)."""

    def __init__(
        self,
        tag_name_casing: str = "lower",
        ignore_self_closing_syntax: bool = False,
        tagNameCasing: str | None = None,
        ignoreSelfClosingSyntax: bool | None = None,
    ):
        # accept the reference's camelCase option names too
        casing = tagNameCasing if tagNameCasing is not None else tag_name_casing
        self_close = (
            ignoreSelfClosingSyntax
            if ignoreSelfClosingSyntax is not None
            else ignore_self_closing_syntax
        )
        self.options = ParserOptions(
            tag_name_casing=casing, ignore_self_closing_syntax=self_close
        )

    def parse_file(self, file_path: str | Path) -> HTMLParseHandle:
        data = Path(file_path).read_bytes()
        return HTMLParseHandle(parse_bytes(data, self.options))

    parseFile = parse_file

    def parse_string(self, raw_html: str) -> HTMLParseHandle:
        return HTMLParseHandle(parse_string(raw_html, self.options))

    parseString = parse_string

    def parse_bytes(self, data: bytes) -> HTMLParseHandle:
        return HTMLParseHandle(parse_bytes(data, self.options))

    def parse_dataframe(self, df, html_col: str = "html", output_col: str = "parsed"):
        from tempeh_spark.udf import parse_html

        return parse_html(df, html_col=html_col, options=self.options, output_col=output_col)
