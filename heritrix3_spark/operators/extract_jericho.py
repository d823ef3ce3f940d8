"""JerichoExtractorHTML re-expression over the stdlib HTML parser.

The reference ships a second, real-parser HTML extractor
(modules/.../extractor/JerichoExtractorHTML.java, 468 LoC on the Jericho
library) whose laws DIVERGE from the regex ExtractorHTML in documented
ways (file:line cites against JerichoExtractorHTML.java):

* elements are walked in document order; each tag's attributes are
  processed in a FIXED law order (href, action, on*, src-family, srcset,
  codebase, classid|data, archive, code, value, style, flashvars, then
  codebase-resolved resources) rather than attribute appearance order
  (:117-309);
* GET **forms synthesize a submission URL**: action + a query string
  built from the form's fields in document order — checked checkboxes/
  radios contribute their value, unchecked ones contribute ``name=``,
  selects contribute selected options, submits their value
  (:364-425; golden vector in JerichoExtractorHTMLTest.testFormsLinkGet:
  ``redirect_me?form=true&checked[]=1&unchecked[]=&selectBox=selectedOption&test=Go``);
* the src family emits only the FIRST present of src/lowsrc/background/
  cite/longdesc/usemap/profile/datasrc (:180-200), and only ONE of
  classid|data (:215-221) — the regex extractor emits every one;
* srcset is ONE embed of the whole value — and (reference quirk, kept)
  it overwrites the ``codebase`` used to resolve later resources
  (:203-208);
* codebase emits an EMBED (the regex extractor emits a navlink);
* meta name=="robots" / http-equiv=="refresh" compare EXACTLY (the regex
  path lowercases); the refresh URI is not quote-stripped and an absent
  '=' keeps the whole content (:312-341);
* base href wins once, resolved against the page (:149-157).

The walk itself is two-phase: a stdlib ``html.parser`` pass builds a
flat element list (with script/style bodies and per-form control lists),
then the law pass emits in document order — a streaming pass could not
emit a form's synthesized URL at the form's own document position.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from heritrix3_spark.operators.extract import (
    MAX_OUTLINKS,
    OUTLINK_TYPE,
    _extract_css_one,
    _extract_js_one,
    _is_very_likely_uri,
    _py_resolve,
    _speculative_fixup,
)

_SRC_FAMILY = (
    "src", "lowsrc", "background", "cite", "longdesc", "usemap", "profile",
    "datasrc",
)
_CONTROL_TAGS = {"input", "select", "textarea"}


class _Walker(HTMLParser):
    """Phase 1: flat element list in document order.

    Each element: dict(tag, attrs (first-occurrence-wins like Jericho's
    ``Attributes.get``), body (script/style), controls (form)).
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.elements: list[dict] = []
        self._capture = None  # open script/style element
        self._form = None  # open form element
        self._select = None  # open select control
        self._textarea = None

    def handle_starttag(self, tag, attrs):
        amap = {}
        flags = set()
        for k, v in attrs:
            k = k.lower()
            if k not in amap:
                amap[k] = v
            if v is None:
                flags.add(k)
        el = {"tag": tag, "attrs": amap, "flags": flags, "body": None,
              "controls": None}
        if tag in ("script", "style"):
            el["body"] = []
            self._capture = el
        if tag == "form":
            el["controls"] = []
            self._form = el
        if self._form is not None and tag in _CONTROL_TAGS:
            ctl = {"tag": tag, "attrs": amap, "flags": flags, "options": [],
                   "text": []}
            self._form["controls"].append(ctl)
            if tag == "select":
                self._select = ctl
            elif tag == "textarea":
                self._textarea = ctl
        if tag == "option" and self._select is not None:
            self._select["options"].append(
                {"attrs": amap, "flags": flags, "text": []}
            )
        self.elements.append(el)

    def handle_endtag(self, tag):
        if self._capture is not None and tag == self._capture["tag"]:
            self._capture["body"] = "".join(self._capture["body"])
            self._capture = None
        if tag == "form":
            self._form = None
        if tag == "select":
            self._select = None
        if tag == "textarea":
            self._textarea = None

    def handle_data(self, data):
        if self._capture is not None:
            self._capture["body"].append(data)
        elif self._textarea is not None:
            self._textarea["text"].append(data)
        elif self._select is not None and self._select["options"]:
            self._select["options"][-1]["text"].append(data)

    def close(self):
        super().close()
        if self._capture is not None and isinstance(self._capture["body"], list):
            self._capture["body"] = "".join(self._capture["body"])
            self._capture = None


def _control_values(ctl: dict) -> list[str]:
    """FormField.getValues / getPredefinedValues analog (see module doc)."""
    tag, attrs, flags = ctl["tag"], ctl["attrs"], ctl["flags"]
    if tag == "input":
        itype = (attrs.get("type") or "text").lower()
        val = attrs.get("value")
        if itype in ("checkbox", "radio"):
            return [val or ""] if "checked" in flags else []
        if itype in ("submit", "image", "button"):
            return [val] if val is not None else []
        return [val] if val is not None else []
    if tag == "select":
        return [
            (o["attrs"].get("value") if o["attrs"].get("value") is not None
             else "".join(o["text"]).strip())
            for o in ctl["options"]
            if "selected" in o["flags"]
        ]
    if tag == "textarea":
        t = "".join(ctl["text"])
        return [t] if t else []
    return []


def _extract_html_jericho_one(
    base: str,
    html: str,
    frames_as_embeds: bool = True,
    ignore_form_actions: bool = False,
    extract_only_form_gets: bool = True,
    extract_javascript: bool = True,
    extract_value_attributes: bool = True,
) -> list[tuple]:
    """One document through the JerichoExtractorHTML laws; returns
    (absolute_url, context, hop) tuples in document order."""
    if not html:
        return []
    w = _Walker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        return []

    out: list[tuple] = []
    cur_base = base
    base_set = False

    def add(url, context, hop, resolve_base=None):
        url = (url or "").strip()
        if not url or url.startswith("data:"):
            return
        out.append((_py_resolve(resolve_base or cur_base, url), context, hop))

    def add_js_strings(code):
        if extract_javascript:
            for url, ctx, hop in _extract_js_one(code or ""):
                out.append(
                    (_py_resolve(cur_base, _speculative_fixup(url, cur_base)), ctx, hop)
                )

    def process_link(val, ctx):
        if val.lower().startswith("javascript:"):
            add_js_strings(val[len("javascript:"):])
        else:
            add(val, ctx, "L")

    def consider_query_string_values(val, ctx):
        for kv in val.split("&"):
            v = kv.split("=", 1)[-1]
            if _is_very_likely_uri(v):
                add(v, ctx, "X")

    def process_general(el):
        nonlocal cur_base, base_set
        tag, attrs = el["tag"], el["attrs"]
        codebase = None
        resources: list[str] = []
        # HREF
        href = attrs.get("href")
        if href is not None:
            if tag == "link":
                rel = attrs.get("rel")
                if rel is not None:
                    _process_link_rel(href, rel)
            else:
                process_link(href, f"{tag}/@href")
            if tag == "base" and not base_set:
                cur_base = _py_resolve(base, href)
                base_set = True
        # ACTION (non-form elements only — forms route to process_form)
        action = attrs.get("action")
        if action is not None and not ignore_form_actions:
            process_link(action, f"{tag}/@action")
        # ON*
        for k, v in attrs.items():
            if k.startswith("on") and v is not None:
                add_js_strings(v)
        # SRC family: FIRST present only
        for k in _SRC_FAMILY:
            v = attrs.get(k)
            if v is not None:
                hop = (
                    "L"
                    if not frames_as_embeds and tag in ("frame", "iframe")
                    else "E"
                )
                add(v, f"{tag}/@{k}", hop)
                break
        # SRCSET: one embed of the whole value; overwrites codebase (quirk)
        srcset = attrs.get("srcset")
        if srcset is not None:
            codebase = srcset
            add(srcset, f"{tag}/@srcset", "E")
        # CODEBASE (embed, unlike the regex extractor's navlink)
        cb = attrs.get("codebase")
        if cb is not None:
            codebase = cb
            add(cb, f"{tag}/@codebase", "E")
        # CLASSID | DATA: first present only
        res1 = attrs.get("classid")
        if res1 is None:
            res1 = attrs.get("data")
        if res1 is not None:
            resources.append(res1)
        archive = attrs.get("archive")
        if archive is not None:
            resources.extend(archive.split())
        code = attrs.get("code")
        if code is not None:
            if tag == "applet" and not code.lower().endswith(".class"):
                code += ".class"
            resources.append(code)
        # VALUE
        value = attrs.get("value")
        if value is not None:
            vctx = f"{tag}/@value"
            if tag == "param" and (attrs.get("name") or "").lower() == "flashvars":
                consider_query_string_values(value, vctx)
            elif extract_value_attributes and _is_very_likely_uri(value):
                add(value, vctx, "L")
        # STYLE attribute
        style = attrs.get("style")
        if style is not None:
            for u, cctx, hop in _extract_css_one(style):
                add(u, cctx, hop)
        # FLASHVARS attribute
        fv = attrs.get("flashvars")
        if fv is not None:
            consider_query_string_values(fv, f"{tag}/@flashvars")
        # codebase-resolved resources
        rb = _py_resolve(cur_base, codebase) if codebase else None
        for res in resources:
            add(res, tag, "E", resolve_base=rb)

    def _process_link_rel(href, rel):
        # processLinkTagWithRel — same law as the regex extractor
        from heritrix3_spark.operators.extract import _REL_EMBED, _REL_IGNORE
        import re as _re

        nav = False
        for kw in _re.split(r"[ \t\n\f\r]+", rel):
            lt = kw.lower()
            if lt in _REL_EMBED:
                add(href, f"link[rel='{lt}']/@href", "E")
                return
            if lt == "pingback":
                return
            if lt in _REL_IGNORE:
                continue
            nav = True
        if nav:
            add(href, "link/@href", "L")

    def process_meta(el) -> bool:
        attrs = el["attrs"]
        name, http_equiv, content = (
            attrs.get("name"), attrs.get("http-equiv"), attrs.get("content"),
        )
        if name == "robots" and content is not None:
            cl = content.lower()
            if "nofollow" in cl or "none" in cl:
                return True
        if http_equiv == "refresh" and content is not None:
            # substring(indexOf('=')+1): absent '=' keeps the whole content
            add(content[content.find("=") + 1:], "meta", "R")
        return False

    def process_form(el):
        attrs = el["attrs"]
        if ignore_form_actions:
            return
        method = attrs.get("method") or "GET"
        if extract_only_form_gets and method.upper() != "GET":
            return
        action = attrs.get("action")
        query = ""
        for ctl in el["controls"] or []:
            cname = ctl["attrs"].get("name")
            if cname is None:
                continue
            vals = _control_values(ctl)
            if vals:
                for v in vals:
                    query += f"&{cname}={v}"
            else:
                query += f"&{cname}="
        if action is None:
            query = query.replace("&", "?", 1)
            url = query
        else:
            if "?" not in action:
                query = query.replace("&", "?", 1)
            url = action + query
        process_link(url, f"form/name={attrs.get('name')}")

    for el in w.elements:
        if len(out) >= MAX_OUTLINKS:
            break
        tag = el["tag"]
        if tag == "meta":
            if process_meta(el):
                break
            continue
        if tag == "script":
            process_general(el)
            add_js_strings(el["body"])
        elif tag == "style":
            process_general(el)
            for u, cctx, hop in _extract_css_one(el["body"] or ""):
                add(u, cctx, hop)
        elif tag == "form":
            process_form(el)
        elif el["attrs"]:
            process_general(el)
    return out[:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_html_jericho_udf(base: pd.Series, html: pd.Series) -> pd.Series:
    """Vectorized JerichoExtractorHTML scan."""
    return pd.Series(
        [
            _extract_html_jericho_one(b, h)
            for b, h in zip(base.fillna(""), html.fillna(""))
        ]
    )
