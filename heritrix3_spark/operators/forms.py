"""HTML forms discovery + form-login submission (modules/forms).

Re-expresses the reference's forms-discovery login machinery:

* **ExtractorHTMLForms** (/root/reference/modules/src/main/java/org/
  archive/modules/forms/ExtractorHTMLForms.java:142-211): for each form
  region (the text from the ``<`` of a ``<form`` tag onward — ExtractorHTML
  records ``A_FORM_OFFSETS`` at ``start6-1``, ExtractorHTML.java:917-919),
  find METHOD / ACTION / ENCTYPE in the form tag, then every ``<input``
  tag until the first bare ``<form>`` / ``</form>`` match, each attribute
  via the anchored ``^[^>]*\\sattr\\s*=\\s*([^>\\s]{1,50000})[^>]*>`` law
  with the trailing-slash/quote cleanup (:191-211). Forms passing
  ``seemsLoginForm()`` (or all, with ``extractAllForms``) are saved and
  annotated (:166-169).
* **HTMLForm** (HTMLForm.java:33-228): input bookkeeping (multiple-submit
  drop :89-100, default type ``text`` :73-76, username candidates =
  text/email, password candidates), ``seemsLoginForm`` (:140-144 — POST +
  exactly one password + a presumed username input),
  ``presumedUsernameInput`` (:146-166 — unique, or the unique one whose
  name contains "username"), ``formData`` (:176-191 — username/password
  substitution; unchecked radio/checkbox dropped with the reference's
  exact ``(!radioᵢ && !checkbox) || checked`` precedence, where the radio
  test is case-insensitive and the checkbox test is case-SENSITIVE), and
  ``asAnnotation`` (:219-227 — ``form:P`` + input-type initials).
* **FormLoginProcessor** (FormLoginProcessor.java:199-296): when a login
  username is configured and the page's SURT form starts with the
  applicable SURT prefix, the first login-seeming form triggers — ONCE
  per *form province* (the configured prefix, or the page's pathless-root
  SURT :249-259) — a synthesized submission CrawlURI: the form ACTION
  (or the page URI) as an ``'S'`` SUBMIT hop, ``form/@action`` context,
  HTTP_POST with ``A_SUBMIT_DATA`` = the filled form data, HIGH
  directive, forceFetch (:261-282). Later eligible forms in the province
  annotate ``nosubmit:<attempts>,<seen>,<province>`` (:229-231);
  province seen/attempt counts are checkpointable state (:298-315).

Engine mapping: pages carry discovered forms as spans of kind ``"form"``
whose text is the raw ``<form ...>...</form>`` markup; parsing runs
Arrow-batched (`parse_forms_col`); province counts live in a
merge-on-read ``form_provinces`` table (provinces are unbounded when the
applicable prefix is blank — one per site root); in-round once-per-
province ordering is the serial law via an ordinal-ordered window.
Divergences (documented): the reference's per-province WARC response
header (:216) is not modeled (no WARC headers here); a saved form with
no METHOD annotates ``form:?`` where the reference would raise a
NullPointerException (:222).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pandas as pd

#: reserved frontier-data keys riding the SUBMIT URI (A_SUBMIT_DATA /
#: A_SUBMIT_ENCTYPE + the implied FetchType.HTTP_POST,
#: FormLoginProcessor.java:267-275). NON-heritable: stripped at candidate
#: inheritance for every hop except the submit row itself.
SUBMIT_DATA_KEY = "__submit_data"
SUBMIT_ENCTYPE_KEY = "__submit_enctype"

_ATTR = {
    name: re.compile(
        r"(?i)^[^>]*\s" + name + r"\s*=\s*([^>\s]{1,50000})[^>]*>"
    )
    for name in ("method", "action", "enctype", "type", "name", "value")
}
_CHECKED = re.compile(r"(?i)^[^>]*\schecked\s*[^>]*>")
_INPUT_OR_FORM = re.compile(r"(?i)(<input\s[^>]*>)|(</?form>)")


def _find_attr(name: str, cs: str) -> str | None:
    """findAttributeValueGroup (ExtractorHTMLForms.java:191-211): first
    match of the anchored attribute pattern, then strip a trailing
    ``'/`` or ``"/`` (self-closing-tag slurp) and surrounding quotes."""
    m = _ATTR[name].search(cs)
    if not m:
        return None
    value = m.group(1)
    for end in ("'/", '"/'):
        if value.endswith(end):
            value = value[: -len(end)]
    return value.strip("'\"")


@dataclass
class FormInput:
    type: str
    name: str | None
    value: str | None
    checked: bool = False


@dataclass
class HTMLForm:
    """HTMLForm.java:33-228 — one law, shared by the Arrow UDF and the
    simulator."""

    method: str | None = None
    action: str | None = None
    enctype: str | None = None
    all_inputs: list = field(default_factory=list)
    candidate_username: list = field(default_factory=list)
    candidate_password: list = field(default_factory=list)

    # -- addField (HTMLForm.java:65-87) ---------------------------------
    def add_field(
        self, type_: str | None, name: str | None, value: str | None,
        checked: bool = False,
    ) -> None:
        if self._is_multiple_form_submit_inputs(type_):
            return
        inp = FormInput(
            type=type_ if type_ is not None else "text",
            name=name, value=value, checked=checked,
        )
        self.all_inputs.append(inp)
        if inp.type.lower() in ("text", "email"):
            self.candidate_username.append(inp)
        elif type_ is not None and type_.lower() == "password":
            self.candidate_password.append(inp)

    def _is_multiple_form_submit_inputs(self, type_: str | None) -> bool:
        """:89-100 — a SECOND submit-type input is dropped (and so is a
        null-typed input once a submit exists: the reference's early
        return only fires for non-null non-submit types)."""
        if type_ is not None and type_.lower() != "submit":
            return False
        return any(i.type.lower() == "submit" for i in self.all_inputs)

    # -- seemsLoginForm (:140-144) ---------------------------------------
    def seems_login_form(self) -> bool:
        return (
            self.method is not None
            and self.method.lower() == "post"
            and len(self.candidate_password) == 1
            and self._presumed_username_input() is not None
        )

    def _presumed_username_input(self):
        """:146-166 — the unique text/email input, else the unique one
        whose name contains "username"."""
        c = self.candidate_username
        if len(c) < 1:
            return None
        if len(c) == 1:
            return c[0]
        choice = None
        for inp in c:
            if inp.name is not None and "username" in inp.name.lower():
                if choice is None:
                    choice = inp
                else:
                    return None
        return choice

    # -- formData (:176-191) ----------------------------------------------
    def form_data(self, username: str, password: str) -> list:
        presumed = self._presumed_username_input()
        out = []
        for inp in self.all_inputs:
            if inp is presumed:
                out.append((inp.name, username))
            elif inp is self.candidate_password[0]:
                out.append((inp.name, password))
            elif (
                inp.type.lower() != "radio" and inp.type != "checkbox"
            ) or inp.checked:
                out.append((inp.name or "", inp.value or ""))
        return out

    # -- asAnnotation (:219-227) -------------------------------------------
    def as_annotation(self) -> str:
        head = self.method[0].upper() if self.method else "?"
        return "form:" + head + "".join(
            i.type[0].lower() for i in self.all_inputs
        )


def parse_form(cs: str) -> HTMLForm:
    """ExtractorHTMLForms.analyze for ONE form region (:142-165): ``cs``
    starts at the ``<`` of the ``<form`` tag. Input scan stops at the
    first bare ``<form>``/``</form>`` match (the alternation's group-2
    end condition — an ATTRIBUTED ``<form ...>`` does not match it, so a
    bare no-attribute form collects zero inputs)."""
    form = HTMLForm(
        method=_find_attr("method", cs),
        action=_find_attr("action", cs),
        enctype=_find_attr("enctype", cs),
    )
    for m in _INPUT_OR_FORM.finditer(cs):
        if m.group(1) is None:
            break
        tag = m.group(1)
        form.add_field(
            _find_attr("type", tag),
            _find_attr("name", tag),
            _find_attr("value", tag),
            bool(_CHECKED.search(tag)),
        )
    return form


# ---------------------------------------------------------------------------
# ExtractorHTMLForms over raw HTML (gate/extract path): find every <form
# occurrence the way ExtractorHTML's tag scan records A_FORM_OFFSETS
# (ExtractorHTML.java:917-919 — the offset is the tag's '<'), then analyze.
# ---------------------------------------------------------------------------
_FORM_TAG = re.compile(r"(?i)<form(?=[\s>])")


def extract_forms(html: str) -> list[HTMLForm]:
    return [parse_form(html[m.start():]) for m in _FORM_TAG.finditer(html)]


def saved_forms(html: str, extract_all: bool = False) -> list[HTMLForm]:
    """The forms ExtractorHTMLForms saves to A_HTML_FORM_OBJECTS (+
    annotates): login-seeming only, or all with ``extractAllForms``."""
    return [
        f for f in extract_forms(html)
        if f.seems_login_form() or extract_all
    ]


def _form_record(f: HTMLForm, username: str, password: str) -> dict:
    login = f.seems_login_form()
    return {
        "method": f.method,
        "action": f.action,
        "enctype": f.enctype,
        "seems_login": login,
        "annotation": f.as_annotation(),
        "data_json": (
            json.dumps(f.form_data(username, password)) if login else None
        ),
    }


FORM_ROW_SCHEMA = (
    "array<struct<method:string,action:string,enctype:string,"
    "seems_login:boolean,annotation:string,data_json:string>>"
)


def parse_forms_col(form_texts, username, password, extract_all: bool = False):
    """Column: (array of form-region texts, login username, login
    password) -> array of saved-form structs. Arrow-batched — a round may
    discover 10^6 forms at scale; parsing never funnels through the
    driver. JSON-string UDF + ``from_json`` (struct-returning scalar
    pandas UDFs are unsupported on this Spark build)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _parse(texts: pd.Series, user: pd.Series, pw: pd.Series) -> pd.Series:
        out = []
        for arr, u, p in zip(texts, user.fillna(""), pw.fillna("")):
            if arr is None:
                out.append(None)
                continue
            recs = []
            for t in arr:
                if t is None:
                    continue
                f = parse_form(t)
                if f.seems_login_form() or extract_all:
                    recs.append(_form_record(f, u, p))
            out.append(json.dumps(recs))
        return pd.Series(out)

    return F.from_json(_parse(form_texts, username, password), FORM_ROW_SCHEMA)


# ---------------------------------------------------------------------------
# FormLoginProcessor config law (scalar twins; the engine folds these to
# plan-time CASE chains)
# ---------------------------------------------------------------------------
def login_entry_for(surt_form: str, form_login: tuple):
    """The applicable (applicable_surt_prefix, username, password) sheet
    for a page: the LONGEST prefix of the page's SURT form (sheet-overlay
    most-specific-wins; the reference's single-processor check is
    ``getSurtForm().startsWith(applicableSurtPrefix)``,
    FormLoginProcessor.java:206). None when nothing matches or the
    matched entry has a blank username (shouldProcess :200-202)."""
    best = None
    for prefix, user, pw in form_login:
        if surt_form.startswith(prefix):
            if best is None or len(prefix) > len(best[0]):
                best = (prefix, user, pw)
    if best is None or not best[1]:
        return None
    return best


def form_province(prefix: str, root_surt: str) -> str:
    """getFormProvince (:249-259): the configured prefix when non-blank,
    else the page's pathless-root SURT."""
    return prefix if prefix.strip() else root_surt


def submit_status(attempts: int, seen: int, province: str) -> str:
    """submitStatusFor (:288-296)."""
    return f"{attempts},{seen},{province}"
