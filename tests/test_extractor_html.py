"""ExtractorHTML attribute-family golden vectors.

Each case ports an assertion from the reference's own unit suite
(/root/reference/modules/src/test/java/org/archive/modules/extractor/
ExtractorHTMLTest.java — line refs per test). Exact-URI expectations are
kept; path normalization the reference gets from UURI (trailing slash on
bare hosts) happens at our canonicalization stage and is not asserted here.
"""

from __future__ import annotations

from heritrix3_spark.operators.extract import _extract_html_one

BASE = "http://www.example.com/"


def _urls(html, base=BASE, **kw):
    return [u for u, c, h in _extract_html_one(base, html, **kw)]


def _pairs(html, base=BASE, **kw):
    return sorted((h, u) for u, c, h in _extract_html_one(base, html, **kw))


def test_no_whitespace_before_valid_attribute():
    # ExtractorHTMLTest.java:148-152
    html = '<frame name="main"src="http://expected.example.com/"> '
    assert _urls(html) == ["http://expected.example.com/"]


def test_frames_as_embeds_option():
    html = '<frame src="/f.html"><iframe src="/g.html">'
    assert _pairs(html) == [("E", f"{BASE}f.html"), ("E", f"{BASE}g.html")]
    assert _pairs(html, frames_as_embeds=False) == [
        ("L", f"{BASE}f.html"),
        ("L", f"{BASE}g.html"),
    ]


def test_only_extract_form_gets():
    # ExtractorHTMLTest.java:182-196 (HER-1280)
    html = (
        '<form method="get" action="http://www.example.com/ok1"> '
        '<form action="http://www.example.com/ok2" method="get"> '
        '<form method="post" action="http://www.example.com/notok"> '
        '<form action="http://www.example.com/ok3"> '
    )
    got = _urls(html)
    assert sorted(got) == [
        "http://www.example.com/ok1",
        "http://www.example.com/ok2",
        "http://www.example.com/ok3",
    ]
    assert len(_urls(html, extract_only_form_gets=False)) == 4


def test_meta_content_uri():
    # ExtractorHTMLTest.java:198-223
    html = (
        '<meta property="og:video" content="http://www.example.com/absolute.mp4" /> '
        '<meta property="og:video" content="/relative.mp4" /> '
        '<meta property="og:video:height" content="333" />'
        '<meta property="og:video:type" content="video/mp4" />'
        '<meta property="strangeproperty" content="notaurl" '
        'meaninglessurl="http://www.example.com/shouldnotbeextracted.html" />'
    )
    assert sorted(_urls(html)) == [
        "http://www.example.com/absolute.mp4",
        "http://www.example.com/relative.mp4",
    ]


def test_meta_robots_nofollow_aborts():
    # ExtractorHTMLTest.java:225-243
    html = (
        "Blah Blah <meta name='robots' content='index,nofollow'>"
        "<a href='blahblah'>blah</a> blahblah"
    )
    assert _urls(html) == []
    # links BEFORE the meta survive (extract() breaks, keeps earlier)
    html2 = "<a href='/before'>x</a><meta name='robots' content='none'><a href='/after'>y</a>"
    assert _urls(html2) == [f"{BASE}before"]


def test_meta_refresh_is_refer_hop():
    # processMeta :1038-1050: refresh -> 'R' hop
    html = "<meta http-equiv='refresh' content=\"5; url='/moved.html'\">"
    assert _pairs(html) == [("R", f"{BASE}moved.html")]


def test_img_srcset_attribute():
    # ExtractorHTMLTest.java:517-542 (data: URI skipped, descriptors parsed)
    html = (
        '<img width="800" height="1200" src="/images/foo.jpg" '
        'class="attachment-full size-full" alt="" '
        'srcset="a,b,c,,, /images/foo1.jpg 800w,data:image/gif;base64,'
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7 700w, "
        '/images/foo2.jpg 480w(data:,foo, ,), /images/foo3.jpg 96w(x" '
        'sizes="(max-width: 800px) 100vw, 800px">'
    )
    assert sorted(_urls(html)) == [
        "http://www.example.com/a,b,c",
        "http://www.example.com/images/foo.jpg",
        "http://www.example.com/images/foo1.jpg",
        "http://www.example.com/images/foo2.jpg",
        "http://www.example.com/images/foo3.jpg",
    ]


def test_source_srcset_attribute():
    # ExtractorHTMLTest.java:543-570
    html = (
        '<picture><source media="(min-width: 992px)" srcset="images/foo1.jpg"> '
        '<source media="(min-width: 500px)" SRCSET="images/foo2.jpg"> '
        '<source media="(min-width: 0px)" srcSet="images/foo3-1x.jpg 1x, '
        'images/foo3-2x.jpg 2x"> '
        '<img src="images/foo.jpg" alt=""> </picture>'
    )
    assert sorted(_urls(html)) == [
        "http://www.example.com/images/foo.jpg",
        "http://www.example.com/images/foo1.jpg",
        "http://www.example.com/images/foo2.jpg",
        "http://www.example.com/images/foo3-1x.jpg",
        "http://www.example.com/images/foo3-2x.jpg",
    ]


def test_link_rel():
    # ExtractorHTMLTest.java:694-726
    base = "https://www.example.org/"
    html = (
        "<link href='/pingback' rel='pingback'>"
        "<link href='/style.css' rel=stylesheet>"
        "<link rel='my stylesheet rocks' href=/style2.css>"
        "<link rel=icon href=/icon.ico>"
        "<link href='http://dns-prefetch.example.com/' rel=dns-prefetch>"
        "<link href=/without-rel>"
        "<link href=/empty-rel rel=''>"
        "<link href=/just-spaces rel='   '>"
        "<link href=/canonical rel=canonical>"
        "<link href=/unknown rel=unknown>"
    )
    assert _pairs(html, base=base) == [
        ("E", "https://www.example.org/icon.ico"),
        ("E", "https://www.example.org/style.css"),
        ("E", "https://www.example.org/style2.css"),
        ("L", "https://www.example.org/canonical"),
        ("L", "https://www.example.org/unknown"),
    ]


def test_base_href_first_wins():
    # ExtractorHTMLTest.java:286-356 (relative/first/absolute base href)
    base = "https://www.schmid-gartenpflanzen.de/forum/index.php/mv/msg/7627/216142/0/"
    rel = '<img src="index.php/fa/89652/0/" border="0" alt="" />'
    assert any(
        ".de/forum/index.php/fa/89652/0/" in u
        for u in _urls('<base href="/forum/"/>\n' + rel, base=base)
    )
    assert any(
        ".de/first/index.php/fa/89652/0/" in u
        for u in _urls('<base href="/first/"/>\n<base href="/forum/"/>\n' + rel, base=base)
    )
    assert any(
        ".de/forum/index.php/fa/89652/0/" in u
        for u in _urls(
            '<base href="https://www.schmid-gartenpflanzen.de/forum/"/>\n' + rel,
            base=base,
        )
    )


def test_speculative_js_extraction_maintains_scheme():
    # ExtractorHTMLTest.java:358-392 (HER-1524)
    base = "https://www.example.com/"
    html = (
        '<script type="text/javascript">_parameter="www.anotherexample.com";'
        '_anotherparameter="www.example.com/index.html";</script>'
    )
    urls = _urls(html, base=base)
    assert "http://www.anotherexample.com" in urls
    assert "https://www.example.com/index.html" in urls


def test_script_writing_script_type_no_bogus_links():
    # ExtractorHTMLTest.java:394-407 (HER-1526)
    html = (
        '<script type="text/javascript">'
        'var gaJsHost = (("https:" == document.location.protocol) '
        '? "https://ssl." : "http://www.");'
        " document.write(unescape(\"%3Cscript src='\" + gaJsHost + "
        "\"google-analytics.com/ga.js' type='text/javascript'%3E%3C/script%3E\"));"
        "</script>"
    )
    assert _urls(html, base="http://www.example.com/en/fiche/dossier/322/") == []


def test_flashvars_param_and_embed():
    # ExtractorHTMLTest.java:448-515 (HER-1728)
    html = (
        '<object classid="clsid:D27CDB6E-AE6D-11cf-96B8-444553540000" '
        'codebase="http://download.macromedia.com/pub/shockwave/cabs/flash/swflash.cab#version=9,0,28,0" '
        'id="ZoomifySlideshowViewer" height="372" width="590">\n'
        '    <param name="flashvars" value="zoomifyXMLPath=ParamZoomifySlideshowViewer.xml">\n'
        '    <param name="menu" value="false">\n'
        '    <param name="src" value="ZoomifySlideshowViewer.swf">\n'
        '    <embed flashvars="zoomifyXMLPath=EmbedZoomifySlideshowViewer.xml" '
        'src="ZoomifySlideshowViewer.swf" menu="false" '
        'type="application/x-shockwave-flash" height="372" width="590">\n'
        "</object> "
    )
    urls = _urls(html)
    assert "http://www.example.com/ParamZoomifySlideshowViewer.xml" in urls
    assert "http://www.example.com/EmbedZoomifySlideshowViewer.xml" in urls
    assert "http://www.example.com/ZoomifySlideshowViewer.swf" in urls


def test_conditional_comments_scanned():
    # ExtractorHTMLTest.java:504-516 (HER-1998)
    html = (
        '<!--[if IE 6]><img src="foo.gif"><![endif]-->'
        '<!--[if IE 6]><script src="foo.js"></script><![endif]-->'
        "<!-- a real comment with <a href='/hidden'>link</a> -->"
    )
    urls = _urls(html)
    assert f"{BASE}foo.gif" in urls
    assert f"{BASE}foo.js" in urls
    assert f"{BASE}hidden" not in urls


def test_on_attributes_and_inline_style():
    # on* handlers run the JS scanner; style attributes run the CSS scanner
    html = (
        "<div onclick=\"location.href='/clicked/page.html'\" "
        "style=\"background: url('/bg.png')\">x</div>"
    )
    pairs = _pairs(html)
    assert ("E", f"{BASE}bg.png") in pairs
    assert ("X", f"{BASE}clicked/page.html") in pairs


def test_javascript_href_scanned_not_linked():
    html = "<a href=\"javascript:open('/popup/win.html')\">x</a>"
    pairs = _pairs(html)
    assert ("X", f"{BASE}popup/win.html") in pairs
    assert all(h != "L" for h, u in pairs)


def test_applet_code_and_codebase():
    # code gets .class appended for applets; resources resolve vs codebase
    html = '<applet codebase="/java/" code="MyApplet" archive="a.jar b.jar">x</applet>'
    pairs = _pairs(html)
    assert ("L", f"{BASE}java/") in pairs  # codebase itself is a link
    assert ("E", f"{BASE}java/MyApplet.class") in pairs
    assert ("E", f"{BASE}java/a.jar") in pairs
    assert ("E", f"{BASE}java/b.jar") in pairs


def test_data_uris_ignored():
    # ExtractorHTMLTest.java:272-284
    html = '<img src="data:image/png;base64,iVBORw0KGg=="> <a href="/real">x</a>'
    assert _urls(html) == [f"{BASE}real"]
