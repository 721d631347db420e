"""Vendored minimal readability analog (E3) — pure stdlib, deterministic.

The reference's mid-cascade extractors are readability-lxml and a bs4
"main-content finder" (robust_content_extractor.py:526-539;
intelligent_content_extractor.py:368-399: walk containers, score by text
mass and link noise, return the best block). Neither library ships in this
container, so this module vendors the SEMANTICS of the Arc90 readability
content scorer in ~120 lines of ``html.parser`` — no third-party imports,
deterministic output, safe for the pinned byte-identical kernel:

* every ``<p>`` earns ``1 + commas + min(len/100, 3)`` points, credited to
  its parent (full) and grandparent (half) — the Arc90 paragraph score;
* container ``class``/``id`` hints add ±25 (``article|content|entry|main|
  post|text|story|body`` vs ``comment|footer|nav|menu|sidebar|widget|
  promo|related|masthead|meta``);
* the winning candidate's score is scaled by ``1 − link_density`` (text
  inside ``<a>`` over total text) — a nav block full of links loses to a
  prose block of the same length;
* output = the winner's paragraphs joined with blank lines; fails (returns
  None) when the best candidate holds < 25 chars (the reference's
  MIN_EXTRACTED_SIZE gate, intelligent_content_extractor.py:179).

Used in two places: ``extraction.extract_one`` inserts it between the
semantic-``<article>`` branch and the strip fallback (method
``"readability_lite"`` — corpus/contract pages always carry ``<article>``,
so the pinned round contract is untouched; wild pages without semantic
tags gain a main-content finder), and ``real_extractors`` registers it as
the always-available strategy before the whole-document bs4 fallback.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_POSITIVE = re.compile(
    r"article|body|content|entry|main|page|post|text|blog|story", re.I)
_NEGATIVE = re.compile(
    r"combx|comment|contact|foot|masthead|media|meta|outbrain|promo|related"
    r"|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget|nav|menu",
    re.I)
_CANDIDATE_TAGS = frozenset({"div", "article", "main", "section", "td"})
_SKIP_TAGS = frozenset({"script", "style", "noscript", "svg", "head"})
_MIN_CHARS = 25  # MIN_EXTRACTED_SIZE analog
_WS = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "parent", "score", "hint", "text_len",
                 "link_text_len", "paras")

    def __init__(self, tag: str, parent: "_Node | None", hint: float):
        self.tag = tag
        self.parent = parent
        self.score = 0.0
        self.hint = hint
        self.text_len = 0
        self.link_text_len = 0
        self.paras: list[str] = []


def _class_weight(attrs: list[tuple[str, str | None]]) -> float:
    blob = " ".join(v for k, v in attrs if k in ("class", "id") and v)
    w = 0.0
    if blob:
        if _NEGATIVE.search(blob):
            w -= 25.0
        if _POSITIVE.search(blob):
            w += 25.0
    return w


class _Scorer(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None, 0.0)
        self.cur = self.root
        self.skip_depth = 0
        self.a_depth = 0
        self.p_buf: list[str] | None = None
        self.p_seq = 0
        self.nodes: list[_Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.a_depth += 1
        if tag == "p":
            self.p_buf = []
            return
        if tag in _CANDIDATE_TAGS:
            self.cur = _Node(tag, self.cur, _class_weight(attrs))
            self.nodes.append(self.cur)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.a_depth = max(0, self.a_depth - 1)
            return
        if tag == "p" and self.p_buf is not None:
            self._close_para()
            return
        if tag in _CANDIDATE_TAGS:
            # close the innermost open candidate of this tag (lenient to
            # malformed nesting: unwind until matched or root)
            node = self.cur
            while node is not self.root and node.tag != tag:
                node = node.parent
            if node is not self.root:
                self.cur = node.parent

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.p_buf is not None:
            self.p_buf.append(data)
        n = len(data.strip())
        if n:
            node = self.cur
            while node is not None:
                node.text_len += n
                if self.a_depth:
                    node.link_text_len += n
                node = node.parent

    def close(self):
        super().close()
        if self.p_buf is not None:   # unclosed trailing <p> still counts
            self._close_para()

    def _close_para(self):
        text = _WS.sub(" ", "".join(self.p_buf or [])).strip()
        self.p_buf = None
        if len(text) < 20:  # Arc90 skips trivial paragraphs
            return
        score = 1.0 + text.count(",") + min(len(text) // 100, 3)
        seq = self.p_seq
        self.p_seq += 1
        parent = self.cur
        parent.score += score
        parent.paras.append((seq, text))
        if parent.parent is not None:
            parent.parent.score += score / 2.0
            parent.parent.paras.append((seq, text))


def extract_readability_lite(doc: str) -> str | None:
    """Best-candidate main content text, or None when nothing scores."""
    scorer = _Scorer()
    try:
        scorer.feed(doc)
        scorer.close()
    except Exception:
        return None
    best, best_score = None, 0.0
    for n in scorer.nodes:
        if n.score <= 0 or not n.paras:
            continue
        density = n.link_text_len / max(n.text_len, 1)
        adj = (n.score + n.hint) * (1.0 - density)
        if adj > best_score:
            best, best_score = n, adj
    if best is None:
        return None
    # paras were credited to parent AND grandparent — dedupe by paragraph
    # sequence id (value-dedup would merge legitimately repeated text)
    seen: set[int] = set()
    paras = []
    for seq, p in sorted(best.paras):
        if seq not in seen:
            seen.add(seq)
            paras.append(p)
    # convert_charrefs already decoded entities during parsing
    text = "\n\n".join(paras)
    return text if len(text) >= _MIN_CHARS else None
