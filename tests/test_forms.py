"""Forms-discovery login machinery (modules/forms) — HTMLForm /
ExtractorHTMLForms / FormLoginProcessor laws + FormLoginSelfTest-style
crawl parity where the login form is DISCOVERED, not configured.

Reference vectors: modules/src/test/java/org/archive/modules/forms/
FormLoginProcessorTest.java (testFormLogin, testFormLoginExtraInputs),
HTMLForm.java:65-227, ExtractorHTMLForms.java:142-211,
FormLoginProcessor.java:199-296, and engine/src/test/java/org/archive/
crawler/selftest/FormLoginSelfTest.java (discovered-form EXPECTED set).
"""

from __future__ import annotations

import json

import pytest

from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.operators import forms as FORMS
from heritrix3_spark.simulator import SimConfig, simulate

# ---------------------------------------------------------------------------
# HTMLForm / ExtractorHTMLForms unit laws
# ---------------------------------------------------------------------------


def test_parse_form_attributes():
    """findAttributeValueGroup law (ExtractorHTMLForms.java:191-211):
    case-insensitive attr match, quote strip, trailing '/ and "/ cleanup."""
    f = FORMS.parse_form(
        '<form METHOD="Post" Action=\'/login\' enctype=multipart/form-data>'
        '<input type="text" name="user"/>'
        "<input TYPE=password NAME='pw'/>"
        "</form>"
    )
    assert f.method == "Post"
    assert f.action == "/login"
    assert f.enctype == "multipart/form-data"
    # the "/ cleanup: <input name="user"/> captures user"/ -> user
    assert [i.name for i in f.all_inputs] == ["user", "pw"]
    assert [i.type for i in f.all_inputs] == ["text", "password"]
    assert f.seems_login_form()


def test_default_type_is_text_and_email_is_username_candidate():
    """HTMLForm.addField (:73-76): null type -> "text"; text/email are
    username candidates."""
    f = FORMS.HTMLForm(method="POST")
    f.add_field(None, "u", "")
    f.add_field("EMAIL", "e", "")
    f.add_field("password", "p", "")
    assert [i.type for i in f.all_inputs] == ["text", "EMAIL", "password"]
    assert len(f.candidate_username) == 2
    assert len(f.candidate_password) == 1


def test_multiple_submit_inputs_dropped():
    """isMultipleFormSubmitInputs (:89-100): a second submit-type input is
    dropped; a null-typed input after a submit is ALSO dropped (the
    early-return only fires for non-null non-submit types)."""
    f = FORMS.HTMLForm(method="POST")
    f.add_field("submit", "go", "Go")
    f.add_field("submit", "go2", "Go2")  # dropped
    f.add_field(None, "sneaky", "x")  # dropped (null type, submit exists)
    f.add_field("text", "u", "")  # kept
    assert [i.name for i in f.all_inputs] == ["go", "u"]


def test_seems_login_form_variants():
    """seemsLoginForm (:140-144): POST + exactly one password + a presumed
    username input."""
    # GET form: no
    f = FORMS.parse_form(
        '<form method="get"><input type="text" name="u">'
        '<input type="password" name="p"></form>'
    )
    assert not f.seems_login_form()
    # two passwords (registration form): no
    f = FORMS.parse_form(
        '<form method="post"><input type="text" name="u">'
        '<input type="password" name="p1"><input type="password" name="p2">'
        "</form>"
    )
    assert not f.seems_login_form()
    # no method at all: no
    f = FORMS.parse_form(
        '<form action="/x"><input type="text" name="u">'
        '<input type="password" name="p"></form>'
    )
    assert not f.seems_login_form()


def test_presumed_username_input_disambiguation():
    """presumedUsernameInput (:146-166): unique text/email input, else the
    unique one whose name contains "username" (case-insensitive), else
    none."""
    # two text inputs, one named *username* -> that one
    f = FORMS.parse_form(
        '<form method="post"><input type="text" name="search">'
        '<input type="text" name="myUserName">'
        '<input type="password" name="p"></form>'
    )
    assert f.seems_login_form()
    assert f._presumed_username_input().name == "myUserName"
    # two *username* inputs -> ambiguous -> not a login form
    f = FORMS.parse_form(
        '<form method="post"><input type="text" name="username1">'
        '<input type="text" name="username2">'
        '<input type="password" name="p"></form>'
    )
    assert not f.seems_login_form()


def test_form_data_extra_inputs_vector():
    """FormLoginProcessorTest.testFormLoginExtraInputs: the 6-pair ordered
    formData vector — unchecked checkbox/radio dropped, checked kept."""
    f = FORMS.HTMLForm(method="post", action="/login")
    f.add_field("text", "username-form-field", "")
    f.add_field("password", "password-form-field", "")
    f.add_field("text", "some-other-form-field", "default value!")
    f.add_field("hidden", "hidden-field", "hidden value!")
    f.add_field("checkbox", "checkbox-field", "unchecked-value", False)
    f.add_field("checkbox", "checkbox-field", "checked-value", True)
    f.add_field("radio", "radio-field", "unchecked-value", False)
    f.add_field("checkbox", "radio-field", "checked-value", True)
    # two text inputs: presumedUsernameInput picks the unique one whose
    # name contains "username" (:146-166)
    assert f.seems_login_form()
    data = f.form_data("jdoe", "********")
    assert data == [
        ("username-form-field", "jdoe"),
        ("password-form-field", "********"),
        ("some-other-form-field", "default value!"),
        ("hidden-field", "hidden value!"),
        ("checkbox-field", "checked-value"),
        ("radio-field", "checked-value"),
    ]


def test_form_data_checkbox_case_sensitivity():
    """formData (:176-191): the radio test is case-INsensitive but the
    checkbox test is case-SENSITIVE — an unchecked "CheckBox"-typed input
    is NOT dropped (it fails the lowercase equals)."""
    f = FORMS.HTMLForm(method="post")
    f.add_field("text", "u", "")
    f.add_field("password", "p", "")
    f.add_field("CheckBox", "cb", "v", False)  # kept (case mismatch)
    f.add_field("RADIO", "r", "v", False)  # dropped (equalsIgnoreCase)
    data = f.form_data("U", "P")
    assert ("cb", "v") in data
    assert all(n != "r" for n, _v in data)


def test_as_annotation():
    """asAnnotation (:219-227): form:<method initial upper> + input-type
    initials lowercased."""
    f = FORMS.parse_form(
        '<form method="post"><input type="text" name="u">'
        '<input type="password" name="p"><input type="submit" value="Go">'
        "</form>"
    )
    assert f.as_annotation() == "form:Ptps"
    # no method -> "?" head (documented divergence: the reference NPEs)
    g = FORMS.HTMLForm()
    g.add_field("Hidden", "h", "x")
    assert g.as_annotation() == "form:?h"


def test_bare_form_tag_stops_input_scan():
    """The input scan stops at the first BARE <form>/</form> (the
    alternation's group-2 condition, ExtractorHTMLForms.java:153) — inputs
    after </form> belong to the next region; an attributed <form x=y>
    does NOT match the bare pattern."""
    html = (
        '<form method="post" action="/a"><input type="text" name="u">'
        '<input type="password" name="p"></form>'
        '<input type="text" name="outside">'
    )
    f = FORMS.parse_form(html)
    assert [i.name for i in f.all_inputs] == ["u", "p"]
    forms = FORMS.extract_forms(
        html + '<form method="get" action="/b"><input type="text" name="q"></form>'
    )
    assert len(forms) == 2
    assert [i.name for i in forms[1].all_inputs] == ["q"]


def test_extract_and_saved_forms():
    """ExtractorHTMLForms.analyze (:142-169): only login-seeming forms are
    saved (all with extractAllForms)."""
    html = (
        '<form method="get" action="/search"><input type="text" name="q"></form>'
        '<form method="post" action="/login"><input type="text" name="u">'
        '<input type="password" name="p"></form>'
    )
    assert len(FORMS.extract_forms(html)) == 2
    saved = FORMS.saved_forms(html)
    assert len(saved) == 1 and saved[0].action == "/login"
    assert len(FORMS.saved_forms(html, extract_all=True)) == 2


def test_login_entry_longest_prefix_and_blank_username():
    """FormLoginProcessor sheet law: most-specific (longest) applicable
    SURT prefix wins; a blank username means no processing
    (shouldProcess, FormLoginProcessor.java:200-202)."""
    entries = (
        ("http://(example,", "site-user", "site-pw"),
        ("http://(example,h,)/app", "app-user", "app-pw"),
        ("http://(other,", "", "x"),  # blank username -> never applies
    )
    got = FORMS.login_entry_for("http://(example,h,)/app/login", entries)
    assert got == ("http://(example,h,)/app", "app-user", "app-pw")
    got = FORMS.login_entry_for("http://(example,z,)/p", entries)
    assert got == ("http://(example,", "site-user", "site-pw")
    assert FORMS.login_entry_for("http://(other,x,)/p", entries) is None
    assert FORMS.login_entry_for("http://(nomatch,)/", entries) is None


def test_form_province_and_submit_status():
    """getFormProvince (:249-259) + submitStatusFor (:288-296)."""
    assert FORMS.form_province("http://(com,", "http://(com,example,)/") == "http://(com,"
    assert (
        FORMS.form_province("  ", "http://(com,example,)/")
        == "http://(com,example,)/"
    )
    assert FORMS.submit_status(0, 0, "http://(com,example,)") == (
        "0,0,http://(com,example,)"
    )


# ---------------------------------------------------------------------------
# FormLoginSelfTest-style crawl parity: the login form is DISCOVERED
# ---------------------------------------------------------------------------

LOGIN_FORM = (
    '<form method="POST" action="/j_security_check">'
    '<input type="text" name="j_username">'
    '<input type="password" name="j_password">'
    '<input type="submit" value="Log In"></form>'
)


def _web():
    return {
        "http://h.example/index.html": [
            ("text", "seed", None, 0),
            ("link", "l", "/login/login.html", 1),
            ("link", "o", "/other.html", 2),
        ],
        "http://h.example/login/login.html": [
            ("text", "please log in", None, 0),
            ("form", LOGIN_FORM, None, 1),
        ],
        # a second page carrying the same login form: must NOT re-submit
        "http://h.example/other.html": [
            ("text", "also a login form here", None, 0),
            ("form", LOGIN_FORM, None, 1),
        ],
        "http://h.example/j_security_check": [
            ("text", "welcome", None, 0),
            ("link", "m", "/success.html", 1),
        ],
        "http://h.example/success.html": [("text", "secret", None, 0)],
    }


def _rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )


def _erows(eng_log):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition, r.annotation)
        for r in eng_log.collect()
    )


def _mk_engine(spark, tmp_path, name, web, kw):
    return CrawlEngine(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )


def test_forms_crawl_parity_discovered_login(spark, tmp_path):
    """FormLoginSelfTest analog: the login form is discovered (never
    configured as a credential), submitted ONCE per province as an 'S'
    SUBMIT hop with HTTP_POST A_SUBMIT_DATA; the post-login page is
    reached; a later page with the same form annotates nosubmit."""
    web = _web()
    kw = dict(
        forms="on",
        form_login=(("http://(example,h,", "Mr. Happy Pants", "xyzzy"),),
        k_per_host=1,
    )
    seeds = ["http://h.example/index.html"]
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = _mk_engine(spark, tmp_path, "forms", web, kw)
    eng.bootstrap(seeds)

    # run until the submit is pending, then inspect the frontier row: the
    # 'S' hop with the filled A_SUBMIT_DATA (FormLoginProcessorTest
    # .testFormLogin / .testFormLoginExtraInputs observables)
    for _ in range(2):
        eng.run_round()
    pend = {
        r.canonical: r for r in eng.export_pending_uris().collect()
    }
    sub = pend["http://h.example/j_security_check"]
    assert sub.hops_path.endswith("S")
    assert sub.via == "http://h.example/login/login.html"
    # NB "Log", not "Log In": the reference's attribute regex
    # ([^>\s]{1,50000}) stops at whitespace inside quoted values
    assert json.loads(sub.data[FORMS.SUBMIT_DATA_KEY]) == [
        ["j_username", "Mr. Happy Pants"],
        ["j_password", "xyzzy"],
        ["", "Log"],
    ]
    eng_log = eng.run(max_rounds=40)

    assert _erows(eng_log) == _rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {r.canonical: r for r in eng_log.collect()}
    # the login page submitted; the later page with the same form did not
    assert "submit:/j_security_check" in by["http://h.example/login/login.html"].annotation
    assert by["http://h.example/other.html"].annotation.startswith(
        "form:Ptps,nosubmit:1,2,"
    )
    # the FormLoginSelfTest EXPECTED law: the post-login page is reached
    assert by["http://h.example/success.html"].fetch_status == 200
    # submit data never inherited by the submit row's children
    kids = [r for r in eng.export_pending_uris().collect()]
    assert all(
        FORMS.SUBMIT_DATA_KEY not in (r.data or {}) for r in kids
    )


def test_forms_blank_prefix_one_province_per_root(spark, tmp_path):
    """A blank applicableSurtPrefix infers the province from the page's
    pathless root (getFormProvince :249-259): two hosts -> two provinces,
    each submits once."""
    web = {
        "http://a.example/idx": [
            ("text", "a", None, 0),
            ("link", "x", "http://b.example/idx", 1),
            ("link", "l", "/login", 2),
        ],
        "http://a.example/login": [("form", LOGIN_FORM, None, 0)],
        "http://b.example/idx": [("link", "l", "/login", 0)],
        "http://b.example/login": [("form", LOGIN_FORM, None, 0)],
        "http://a.example/j_security_check": [("text", "wa", None, 0)],
        "http://b.example/j_security_check": [("text", "wb", None, 0)],
    }
    kw = dict(forms="on", form_login=(("", "u", "p"),), k_per_host=2)
    seeds = ["http://a.example/idx", "http://b.example/idx"]
    sim_log, _ = simulate(web, seeds, SimConfig(**kw))
    eng = _mk_engine(spark, tmp_path, "prov", web, kw)
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _erows(eng_log) == _rows(sim_log)
    by = {r.canonical: r for r in eng_log.collect()}
    assert by["http://a.example/j_security_check"].fetch_status == 200
    assert by["http://b.example/j_security_check"].fetch_status == 200
    # province table: two rows, attempts==1 each
    provs = {
        r.province: (r.attempts, r.seen)
        for r in eng.form_prov_t.read(spark).collect()
    }
    assert provs == {
        "http://(example,a,)/": (1, 1),
        "http://(example,b,)/": (1, 1),
    }


def test_forms_extract_all_annotates_non_login_forms(spark, tmp_path):
    """extractAllForms saves (and annotates) GET/search forms too —
    ExtractorHTMLForms.java:166-169."""
    web = {
        "http://h.example/p": [
            ("text", "x", None, 0),
            ("form", '<form method="get" action="/s"><input type="text" '
                     'name="q"></form>', None, 1),
        ],
    }
    kw = dict(forms="on", extract_all_forms=True)
    seeds = ["http://h.example/p"]
    sim_log, _ = simulate(web, seeds, SimConfig(**kw))
    eng = _mk_engine(spark, tmp_path, "all", web, kw)
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=10)
    assert _erows(eng_log) == _rows(sim_log)
    (row,) = [r for r in eng_log.collect() if r.canonical.endswith("/p")]
    assert row.annotation == "form:Gt"
    # no login configured: no submission was synthesized
    assert all(
        not r.canonical.endswith("/s") for r in eng_log.collect()
    )


def test_forms_province_state_survives_checkpoint_resume(spark, tmp_path):
    """Province attempt counts are checkpointable state
    (FormLoginProcessor.java:298-315): resume after the submission round
    and the later login-seeming page still declines (nosubmit), exactly
    as in the uninterrupted run."""
    web = _web()
    kw = dict(
        forms="on",
        form_login=(("http://(example,h,", "u", "p"),),
        k_per_host=1,
    )
    cfgkw = dict(num_buckets=4, ordinal_partitions=1, bloom=False, **kw)
    seeds = ["http://h.example/index.html"]
    eng = CrawlEngine(
        spark, str(tmp_path / "ckpt"),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(**cfgkw),
    )
    eng.bootstrap(seeds)
    full_log = eng.run(max_rounds=40)
    full = _erows(full_log)
    # resume from the checkpoint right after the submission round (round 1
    # fetches login.html and submits) and re-run to completion
    eng2 = CrawlEngine.resume(
        spark, str(tmp_path / "ckpt"),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(**cfgkw),
        tag="r000002",
    )
    resumed = eng2.run(max_rounds=40)
    assert _erows(resumed) == full
