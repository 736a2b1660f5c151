"""Round-5 corpus additions: close the last four absent suite groups
(tests/test_suite_coverage_map.py round-4 absent list).

- optional_format_idn_hostname.json / optional_format_idn_email.json —
  exercised against the new pure-Python IDNA2008-subset validators
  (jschon_ray/vspec/formats.py validate_idn_hostname/validate_idn_email:
  RFC 5890/5891/5892 code-point + contextual rules, RFC 5893 Bidi rule,
  punycode round-trip, octet lengths; RFC 6531 SMTPUTF8 mailbox).
  Format files run in the harness's fmt mode with OUR validators (the
  official suite's format-assertion config), so no reference crosscheck
  applies — but every label below is asserted against the validator at
  generation time, abort on mismatch.

- optional_dependencies_compatibility.json — the official optional file
  expects draft-07 ``dependencies`` compat support; the REFERENCE
  treats ``dependencies`` as an unknown keyword in 2019-09/2020-12
  (annotation pass-through, vocabulary-gated keyword sets), and the
  north star is reference parity, so these cases pin the pass-through
  behavior and are cross-checked against the actual reference evaluator
  under all three dialects (abort on mismatch, like gen_suite_corpus_r4).

- optional_no_schema.json — schemas with no ``$schema``: the harness
  (like the reference's metaschema_uri parameter, test_suite.py:105-116)
  binds the directory's default dialect; keywords must behave exactly as
  under an explicit ``$schema``. Cross-checked against the reference.

Run from repo root: python scripts/gen_suite_corpus_r5.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
CORPUS = ROOT / "tests" / "suite_corpus"
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT))


# ---------------------------------------------------------------------------
# idn-hostname

def _a(label: str) -> str:
    """A-label (wire) form, computed — never hand-typed."""
    return "xn--" + label.encode("punycode").decode("ascii")


IDN_HOSTNAME_ROWS = [
    # (description, value, valid)
    ("plain ascii hostname", "example.com", True),
    ("ascii is case-insensitive (LDH)", "EXAMPLE.COM", True),
    ("korean u-labels", "실례.테스트", True),
    ("matching a-labels round-trip",
     _a("실례") + "." + _a("테스트"), True),
    ("sharp s is exceptionally PVALID", "faße.de", True),
    ("a-label of sharp s", _a("faße") + ".de", True),
    ("greek final sigma is exceptionally PVALID", "ας", True),
    ("u+3007 ideographic zero is exceptionally PVALID", "〇ab", True),
    ("tibetan tsheg is exceptionally PVALID",
     "ཀ་ཁ", True),
    ("single u-label (no dot required)", "é", True),
    ("inner hyphen", "ab-c.de", True),
    ("63-octet ascii label", "x" * 63 + ".de", True),
    ("64-octet ascii label", "x" * 64 + ".de", False),
    ("253-octet total", ".".join(["a"] * 127), True),
    ("over 253-octet total", ".".join(["a"] * 127) + ".a", False),
    ("empty string", "", False),
    ("empty label (consecutive dots)", "a..b", False),
    ("trailing dot (empty final label)", "a.b.", False),
    ("leading hyphen", "-abc.de", False),
    ("trailing hyphen", "abc-.de", False),
    ("underscore is not LDH", "_abc.de", False),
    ("space is disallowed", "a b.de", False),
    ("no-break space is disallowed", "a b.de", False),
    ("capital greek is DISALLOWED (Lu)", "Σα.de", False),
    ("nfc-composed acute accent", "ábc.de", True),
    ("nfd-decomposed acute accent violates NFC", "ábc.de", False),
    ("leading combining mark", "́abc.de", False),
    ("hangul tone mark U+302E is DISALLOWED anywhere",
     "실〮례.테스트", False),
    ("arabic tatweel U+0640 is DISALLOWED", "بـب", False),
    ("middle dot between l's (CONTEXTO)", "l·l", True),
    ("middle dot without flanking l's", "a·b", False),
    ("greek keraia before greek (CONTEXTO)", "͵α", True),
    ("greek keraia before latin", "͵a", False),
    ("greek keraia at end of label", "α͵", False),
    ("hebrew geresh after hebrew (CONTEXTO)", "א׳", True),
    ("hebrew geresh after latin", "a׳", False),
    ("hebrew gershayim after hebrew", "א״", True),
    ("katakana middle dot with katakana (CONTEXTO)",
     "ト・ト", True),
    ("katakana middle dot alone", "・", False),
    ("katakana middle dot in latin label", "abc・def", False),
    ("zwj after virama (CONTEXTJ)", "क्‍ष", True),
    ("zwnj after virama (CONTEXTJ)", "क्‌ष", True),
    ("zwnj without virama", "a‌b", False),
    ("rtl label all-hebrew (Bidi rule)", "אב.de", True),
    ("rtl label ending in latin violates Bidi", "אa.de", False),
    ("ltr label containing hebrew violates Bidi", "aא.de", False),
    ("all-arabic-digit label violates Bidi rule 1",
     "٠١", False),
    ("mixed arabic-indic digit sets", "٠۰", False),
    ("consistent arabic-indic digits after arabic letter",
     "ب٠١", True),
    ("a-label that decodes to pure ascii is fake", "xn--a", False),
    ("a-label with invalid punycode", "xn--a000000000!", False),
    ("ideographic full stop as separator",
     "実例。テスト", True),
    ("fullwidth full stop as separator", "example．com", True),
]

IDN_EMAIL_ROWS = [
    ("plain ascii mailbox", "user@example.com", True),
    ("unicode local and domain",
     "用户@例え.テスト", True),
    ("greek mailbox",
     "θσερ@εχαμπλ"
     "ε.ψομ", True),
    ("accented local part", "Pelé@example.com", True),
    ("quoted local part", '"john doe"@example.com', True),
    ("ipv4 address literal", "a@[127.0.0.1]", True),
    ("ipv6 address literal", "a@[IPv6:::1]", True),
    ("dotted local", "first.last@example.com", True),
    ("missing at-sign", "example.com", False),
    ("empty local part", "@example.com", False),
    ("empty domain", "user@", False),
    ("single-label domain", "a@b", False),
    ("two at-signs", "a@b@c.de", False),
    ("space in local part", "a b@example.com", False),
    ("ideographic space in local part",
     "用　户@example.com", False),
    ("leading dot in local", ".a@example.com", False),
    ("trailing dot in local", "a.@example.com", False),
    ("consecutive dots in local", "a..b@example.com", False),
    ("domain with leading hyphen", "user@-bad.com", False),
    ("domain label with tone mark",
     "user@실〮례.테스트", False),
    ("fake a-label domain", "user@xn--a.com", False),
    ("uppercase ascii domain", "user@EXAMPLE.COM", True),
]


def selfcheck_formats():
    from jschon_ray.vspec.formats import (validate_idn_email,
                                          validate_idn_hostname)

    def ok(fn, v):
        try:
            fn(v)
            return True
        except ValueError:
            return False

    bad = 0
    for desc, v, exp in IDN_HOSTNAME_ROWS:
        if ok(validate_idn_hostname, v) != exp:
            bad += 1
            print(f"idn-hostname MISMATCH: {desc}: {v!r} stated {exp}",
                  file=sys.stderr)
    for desc, v, exp in IDN_EMAIL_ROWS:
        if ok(validate_idn_email, v) != exp:
            bad += 1
            print(f"idn-email MISMATCH: {desc}: {v!r} stated {exp}",
                  file=sys.stderr)
    if bad:
        sys.exit(f"{bad} validator/label mismatches — aborting")
    print(f"format selfcheck: {len(IDN_HOSTNAME_ROWS)} idn-hostname + "
          f"{len(IDN_EMAIL_ROWS)} idn-email labels agree")


# ---------------------------------------------------------------------------
# dependencies-compatibility: the draft-07 'dependencies' keyword is an
# UNKNOWN keyword in both supported dialects — collected as an
# annotation, never constraining (reference parity; the official
# optional file's expectation of compat support is a deliberate,
# documented deviation — suite_coverage_map note).

DEPENDENCIES_COMPAT_CASES = [
    {
        "description":
            "draft-07 'dependencies' (schema form) is an unknown "
            "keyword: never constrains",
        "schema": {"dependencies": {"bar": {"required": ["foo"]}}},
        "tests": [
            ("object with trigger but not dependency",
             {"bar": 2}, True),
            ("object with both", {"foo": 1, "bar": 2}, True),
            ("object without trigger", {"foo": 1}, True),
            ("non-object", 12, True),
        ],
    },
    {
        "description":
            "draft-07 'dependencies' (array form) is an unknown "
            "keyword: never constrains",
        "schema": {"dependencies": {"bar": ["foo"]}},
        "tests": [
            ("missing dependency still valid", {"bar": 2}, True),
            ("present dependency valid", {"foo": 1, "bar": 2}, True),
        ],
    },
    {
        "description":
            "modern split keywords DO constrain alongside ignored "
            "'dependencies'",
        "schema": {"dependencies": {"bar": ["foo"]},
                   "dependentRequired": {"bar": ["foo"]}},
        "tests": [
            ("dependentRequired enforces what dependencies cannot",
             {"bar": 2}, False),
            ("satisfied", {"foo": 1, "bar": 2}, True),
        ],
    },
    # NOTE: $ref INTO /dependencies/... (an unknown-keyword location) is
    # deliberately not here — the reference CatalogErrors on that class
    # and our support for it is pinned, with the deviation documented,
    # by optional_ref_of_unknown_keyword.json.
]

NO_SCHEMA_CASES = [
    {
        "description":
            "schema with no $schema binds the session default dialect: "
            "assertions behave identically",
        "schema": {"type": "object", "required": ["a"],
                   "properties": {"a": {"type": "integer",
                                        "minimum": 3}}},
        "tests": [
            ("valid instance", {"a": 4}, True),
            ("below minimum", {"a": 2}, False),
            ("missing required", {"b": 1}, False),
            ("non-object", "str", False),
        ],
    },
    {
        "description": "boolean schema true with no $schema",
        "schema": True,
        "tests": [("anything allowed", {"a": 1}, True),
                  ("number allowed", 5, True)],
    },
    {
        "description": "boolean schema false with no $schema",
        "schema": False,
        "tests": [("everything rejected", {"a": 1}, False),
                  ("number rejected", 5, False)],
    },
    {
        "description":
            "$ref resolves inside a no-$schema resource (default "
            "dialect supplies the core vocabulary)",
        "schema": {"$defs": {"pos": {"type": "integer",
                                     "exclusiveMinimum": 0}},
                   "properties": {"n": {"$ref": "#/$defs/pos"}}},
        "tests": [("positive ok", {"n": 2}, True),
                  ("zero fails", {"n": 0}, False)],
    },
    {
        "description":
            "applicators under a no-$schema root",
        "schema": {"allOf": [{"minProperties": 1}],
                   "not": {"required": ["forbidden"]}},
        "tests": [("passes both", {"a": 1}, True),
                  ("empty object fails minProperties", {}, False),
                  ("forbidden member fails not", {"forbidden": 1},
                   False)],
    },
]


def _norm(cases):
    return [{"description": c["description"], "schema": c["schema"],
             "tests": [{"description": d, "data": v, "valid": ok}
                       for d, v, ok in c["tests"]]}
            for c in cases]


def crosscheck(files_by_version):
    from ref_oracle import evaluate_with_reference, load_reference

    handles = {v: load_reference(v)
               for v in ("2020-12", "2019-09", "next")}
    if any(h is None for h in handles.values()):
        sys.exit("reference unavailable — refusing to write unchecked "
                 "cases")
    meta = {"2020-12": "https://json-schema.org/draft/2020-12/schema",
            "2019-09": "https://json-schema.org/draft/2019-09/schema",
            "next": "https://json-schema.org/draft/next/schema"}
    n = bad = 0
    for versions, cases in files_by_version:
        for case in cases:
            for t in case["tests"]:
                for ver in versions:
                    schema = case["schema"]
                    if isinstance(schema, dict) and "$schema" not in schema:
                        schema = {"$schema": meta[ver], **schema}
                    if isinstance(schema, dict) and "$id" not in schema:
                        schema = {**schema,
                                  "$id": f"https://gen-r5.local/{n}-{ver}"}
                    out = evaluate_with_reference(
                        schema, t["data"], handle=handles[ver])
                    n += 1
                    if bool(out["valid"]) != t["valid"]:
                        bad += 1
                        print(f"MISMATCH [{ver}] {case['description']} /"
                              f" {t['description']}: stated {t['valid']},"
                              f" reference says {out['valid']}",
                              file=sys.stderr)
    if bad:
        sys.exit(f"{bad}/{n} reference mismatches — aborting")
    print(f"reference crosscheck: {n} evaluations, all agree")


def write(path, cases):
    path.write_text(json.dumps(cases, indent=2, ensure_ascii=False)
                    + "\n")
    n = sum(len(c["tests"]) for c in cases)
    print(f"wrote {path.relative_to(ROOT)}: {len(cases)} groups, "
          f"{n} tests")
    return n


def main():
    selfcheck_formats()
    d2020 = CORPUS / "2020-12"
    total = 0
    for fname, fmt, rows in [
            ("optional_format_idn_hostname.json", "idn-hostname",
             IDN_HOSTNAME_ROWS),
            ("optional_format_idn_email.json", "idn-email",
             IDN_EMAIL_ROWS)]:
        cases = [{"description": f"validation of {fmt} strings",
                  "schema": {"format": fmt},
                  "tests": [{"description": d, "data": v, "valid": ok}
                            for d, v, ok in rows]}]
        total += write(d2020 / fname, cases)

    dep = _norm(DEPENDENCIES_COMPAT_CASES)
    nos = _norm(NO_SCHEMA_CASES)
    crosscheck([(("2020-12", "2019-09", "next"), dep),
                (("2020-12", "2019-09", "next"), nos)])
    total += write(d2020 / "optional_dependencies_compatibility.json",
                   dep)
    total += write(d2020 / "optional_no_schema.json", nos)
    print(f"total generated test rows: {total}")


if __name__ == "__main__":
    main()
