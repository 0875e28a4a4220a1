"""HTML → text extraction with a pinned, byte-identical contract.

The reference has no HTML path (it ingests JSON/CSV/text —
/root/reference/services.py:23-64); the web-scale input contract
(BASELINE.json ``input_hint``) adds an ``html: binary`` column and requires
**byte-identical extracted text per url** between the pipeline UDF and the
pytest oracle. We satisfy that by pinning ONE pure-Python extractor here and
importing it from both places — parity by construction, no floating-point or
library-version drift possible.

``render_html`` is the deterministic inverse used by the synthetic corpus
generator (sources/corpus.py): render(text) → html bytes such that
extract_text(render(text)) == text exactly, giving every test a golden
column for free.
"""

from __future__ import annotations

import html as _html
import re
from typing import Union

# Decode policy is part of the pinned contract: UTF-8 with replacement.
_DECODE_ERRORS = "replace"

# Non-content elements dropped wholesale (main-content extraction policy):
# code/styling plus chrome (title/nav/header/footer/aside).
_SCRIPT_STYLE = re.compile(
    r"<(script|style|title|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level tags become paragraph breaks so document structure survives.
_BLOCK_TAG = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|article|section|header|"
    r"footer|blockquote|pre|title|body|html|head|nav|aside|main|figure)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n{2,}")


def extract_text(html_bytes: Union[bytes, bytearray, str]) -> str:
    """Pinned extractor: drop script/style/comments, break on block tags,
    strip remaining tags, unescape entities, normalize whitespace.

    Deterministic on bytes in → str out; this exact function is both the
    pipeline pandas-UDF body and the pytest oracle (BASELINE.md row 2).
    """
    if isinstance(html_bytes, (bytes, bytearray)):
        raw = bytes(html_bytes).decode("utf-8", errors=_DECODE_ERRORS)
    else:
        raw = html_bytes
    no_scripts = _SCRIPT_STYLE.sub(" ", raw)
    no_comments = _COMMENT.sub(" ", no_scripts)
    with_breaks = _BLOCK_TAG.sub("\n", no_comments)
    no_tags = _ANY_TAG.sub(" ", with_breaks)
    unescaped = _html.unescape(no_tags)
    collapsed = _WS_RUN.sub(" ", unescaped)
    lines = [ln.strip() for ln in collapsed.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return text


def render_html(text: str, title: str = "", lang: str = "en") -> bytes:
    """Deterministic synthetic page renderer (corpus generator inverse).

    Wraps each text line in <p>…</p> with escaped entities plus fixed
    boilerplate (head/script/style/nav) that the extractor must drop.
    Invariant (tested): extract_text(render_html(t)) == canonical(t) where
    canonical = the extractor's whitespace normal form of t.
    """
    body = "\n".join(
        f"<p>{_html.escape(line)}</p>" for line in text.split("\n") if line
    )
    title_html = _html.escape(title) if title else "untitled"
    page = (
        f'<!DOCTYPE html><html lang="{lang}"><head>'
        f"<title>{title_html}</title>"
        "<style>body { font: 14px sans-serif; }</style>"
        '<script type="text/javascript">var tracker = "noise";</script>'
        "</head><body>"
        "<nav>home | about</nav>"
        "<!-- boilerplate comment -->"
        f"<article>{body}</article>"
        "<footer>generated corpus page</footer>"
        "</body></html>"
    )
    return page.encode("utf-8")
