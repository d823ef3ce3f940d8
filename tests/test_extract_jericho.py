"""JerichoExtractorHTML re-expression: reference golden vectors + the
documented divergences from the regex ExtractorHTML.

Reference: modules/.../extractor/JerichoExtractorHTML.java (laws cited in
operators/extract_jericho.py) and its test
JerichoExtractorHTMLTest.java:55-140 (the form-synthesis vectors).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix3_spark.operators import extract as EX
from heritrix3_spark.operators.extract_jericho import (
    _extract_html_jericho_one as jericho,
)
from heritrix3_spark.operators.extract_jericho import extract_html_jericho_udf

BASE = "http://www.example.org"

#: the reference test's own form fixture (JerichoExtractorHTMLTest:63-73)
FORM_CS = (
    '<form name="testform" method="%s" action="redirect_me?form=true"> '
    '  <INPUT TYPE=CHECKBOX NAME="checked[]" VALUE="1" CHECKED> '
    '  <INPUT TYPE=CHECKBOX NAME="unchecked[]" VALUE="1"> '
    '  <select name="selectBox">'
    '    <option value="selectedOption" selected>option1</option>'
    '    <option value="nonselectedOption">option2</option>'
    "  </select>"
    '  <input type="submit" name="test" value="Go">'
    "</form>"
)
FORM_URL = (
    "http://www.example.org/redirect_me?form=true"
    "&checked[]=1&unchecked[]=&selectBox=selectedOption&test=Go"
)


def _urls(out):
    return [u for u, _, _ in out]


def test_forms_link_get():
    """testFormsLinkGet: GET form -> synthesized submission URL (exact
    reference vector incl. the unchecked-checkbox empty value)."""
    assert FORM_URL in _urls(jericho(BASE, FORM_CS % "GET"))


def test_forms_link_ignore_post():
    """testFormsLinkIgnorePost: POST forms ignored by default."""
    assert FORM_URL not in _urls(jericho(BASE, FORM_CS % "POST"))


def test_forms_link_find_post():
    """testFormsLinkFindPost: extract_only_form_gets=False finds POSTs."""
    got = jericho(BASE, FORM_CS % "POST", extract_only_form_gets=False)
    assert FORM_URL in _urls(got)


def test_form_without_action_and_no_query_mark():
    # no action: "&a=1" -> "?a=1" resolved against base
    html = '<form method="get"><input name="a" value="1"></form>'
    assert _urls(jericho(BASE + "/page", html)) == [
        "http://www.example.org/?a=1"
    ]


def test_src_family_first_only_divergence():
    """Jericho emits only the FIRST present src-family attribute; the
    regex extractor emits every one — a documented divergence."""
    html = '<img src="/a.png" lowsrc="/b.png" longdesc="/c.html">'
    assert _urls(jericho(BASE, html)) == ["http://www.example.org/a.png"]
    regex_urls = [u for u, _, _ in EX._extract_html_one(BASE, html)]
    assert set(regex_urls) == {
        "http://www.example.org/a.png",
        "http://www.example.org/b.png",
        "http://www.example.org/c.html",
    }


def test_classid_or_data_first_only():
    html = '<object classid="x.cab" data="/d.swf"></object>'
    assert _urls(jericho(BASE, html)) == ["http://www.example.org/x.cab"]


def test_srcset_whole_value_and_codebase_quirk():
    """srcset is ONE embed of the whole value AND (reference quirk)
    overwrites the codebase used for later resources."""
    html = '<object srcset="/cb/img.png 2x" data="rel.swf"></object>'
    got = jericho(BASE, html)
    assert _urls(got) == [
        "http://www.example.org/cb/img.png 2x",  # the raw whole value
        # 'rel.swf' resolves against the srcset-overwritten codebase
        "http://www.example.org/cb/rel.swf",
    ]


def test_meta_refresh_exact_and_unstripped():
    # exact http-equiv compare: "Refresh" (capital R) is NOT matched —
    # the regex extractor lowercases (documented divergence)
    assert _urls(jericho(BASE, '<meta http-equiv="Refresh" content="0;url=/r">')) == []
    got = jericho(BASE, '<meta http-equiv="refresh" content="0;url=/r">')
    assert [(u, h) for u, _, h in got] == [("http://www.example.org/r", "R")]
    # quotes are NOT stripped (unlike the regex extractor)
    got2 = jericho(BASE, "<meta http-equiv=\"refresh\" content=\"0;url='/q'\">")
    assert _urls(got2) == ["http://www.example.org/'/q'"]


def test_meta_robots_nofollow_stops():
    html = (
        '<a href="/before">x</a>'
        '<meta name="robots" content="nofollow">'
        '<a href="/after">y</a>'
    )
    assert _urls(jericho(BASE, html)) == ["http://www.example.org/before"]


def test_base_script_style_and_rel_laws_match_regex_extractor():
    html = (
        '<base href="http://other.example/dir/">'
        '<a href="x.html">a</a>'
        '<link rel="stylesheet" href="s.css">'
        '<script>var u = "deep/page.html";</script>'
        '<style>body { background: url(bg.gif); }</style>'
        '<div onclick="go(\'js/page.html\')">c</div>'
    )
    got = jericho(BASE, html)
    urls = _urls(got)
    assert "http://other.example/dir/x.html" in urls  # base applied
    assert "http://other.example/dir/s.css" in urls  # rel embed
    assert "http://other.example/dir/deep/page.html" in urls  # js scan
    assert "http://other.example/dir/bg.gif" in urls  # style body css
    assert "http://other.example/dir/js/page.html" in urls  # on* handler


def test_jericho_udf_spark(spark):
    df = spark.createDataFrame(
        [(BASE, FORM_CS % "GET"), (BASE, '<img src="/i.png">')],
        ["base", "html"],
    )
    got = {
        r.l.url
        for r in df.select(
            F.explode(extract_html_jericho_udf("base", "html")).alias("l")
        ).collect()
    }
    assert FORM_URL in got and "http://www.example.org/i.png" in got
