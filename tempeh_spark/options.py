"""Parser options, mirroring the reference API surface.

Reference: HTMLParser.js:82-96 — ``HTMLParser({tagNameCasing,
ignoreSelfClosingSyntax})`` with defaults ``lower`` / ``False``.
"""

from __future__ import annotations

from dataclasses import dataclass

_CASINGS = ("lower", "upper", "preserve")


@dataclass(frozen=True)
class ParserOptions:
    """Options accepted by every parse entry point.

    tagNameCasing: how element tag names are normalized in the tree builder
        (reference parseTemplate.js:68-78, 185-194). Casing affects
        closing-tag matching: under ``preserve``, ``</div>`` does not close
        ``<Div>``.
    ignoreSelfClosingSyntax: when True, ``/>`` on non-void elements is
        treated as a plain ``>`` (HTML-spec behavior); void elements always
        self-close (reference lexer.js:795-809).
    sniff_bom: when True (the reference's ``parseFile`` path,
        lexer.js:440-501) the first 4 bytes are BOM-sniffed to select
        UTF-8/16/32 decoding; when False (the ``parseString`` path,
        lexer.js:141-145) input is treated as raw UTF-8 with no BOM skip.
    """

    tag_name_casing: str = "lower"
    ignore_self_closing_syntax: bool = False
    sniff_bom: bool = True

    def __post_init__(self) -> None:
        if self.tag_name_casing not in _CASINGS:
            raise ValueError(
                f"tag_name_casing must be one of {_CASINGS}, got {self.tag_name_casing!r}"
            )


DEFAULT_OPTIONS = ParserOptions()
