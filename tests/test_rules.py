"""Rule loader / template-compile unit tests (SURVEY.md 2.7, 5.2 #2).

Template->regex behavior pinned against the reference's
ConfigManager.cpp:203-226; validation against the editor's
ValidationService.cs:20-148.
"""

import re

import pytest

from logeventprocessor_spark.rules import (
    Rule,
    RuleStep,
    RuleValidationError,
    canonical_rules,
    collapse_double_backslashes,
    load_rules_yaml,
    template_to_regex,
    validate_rules,
)


def test_template_hash_becomes_nonspace_capture():
    assert template_to_regex(".*hello # world.*") == r".*hello ([^\s]+) world.*"


def test_template_multiple_hashes():
    assert template_to_regex("# says #") == r"([^\s]+) says ([^\s]+)"


def test_double_backslash_collapse():
    assert collapse_double_backslashes(".*\\\\[ERROR\\\\].*") == r".*\[ERROR\].*"
    assert template_to_regex(".*\\\\[ERROR\\\\].*") == r".*\[ERROR\].*"


def test_compiled_template_matches_like_reference():
    pat = re.compile(template_to_regex(".*hello # world.*"), re.IGNORECASE)
    m = pat.search("say Hello cruel world now")
    assert m and m.group(1) == "cruel"
    assert not pat.search("hello  world")  # '#' requires >=1 non-space char


def test_canonical_rules_compile_and_order():
    rules = canonical_rules()
    assert [r.rule_idx for r in rules] == list(range(len(rules)))
    for r in rules:
        re.compile(r.pattern)


def test_validation_rejects_duplicates():
    rules = [Rule("a", 0, "x"), Rule("a", 1, "y")]
    with pytest.raises(RuleValidationError):
        validate_rules(rules)


def test_validation_rejects_bad_regex():
    with pytest.raises(RuleValidationError):
        validate_rules([Rule("a", 0, "([unclosed")])


def test_validation_rejects_bad_action_type():
    with pytest.raises(RuleValidationError):
        validate_rules([Rule("a", 0, "x", steps=(RuleStep(0, "launch", "v"),))])


def test_validation_rejects_negative_cooldown():
    with pytest.raises(RuleValidationError):
        validate_rules([Rule("a", 0, "x", cooldown_ms=-1)])


def test_yaml_loader_roundtrip(tmp_path):
    y = tmp_path / "rules.yaml"
    y.write_text(
        """
regex_rules:
  - name: hello_world_response
    pattern: ".*hello # world.*"
    action_type: command
    action_value: "g # Goodbye"
  - name: attack_minions
    pattern: ".*Attack my minions.*"
    cooldown_ms: 5000
    actions:
      - type: keystroke
        value: "Ctrl + 1"
        modifiers: 2
        delay_ms: 2500
      - type: command
        value: "g at delaying"
  - name: disabled_rule
    pattern: "never"
    enabled: false
    action_type: text
    action_value: "x"
"""
    )
    rules = load_rules_yaml(str(y))
    assert len(rules) == 3
    assert rules[0].pattern == r".*hello ([^\s]+) world.*"
    assert rules[0].steps[0].type == "command"
    assert rules[1].cooldown_ms == 5000
    assert len(rules[1].steps) == 2
    assert rules[1].steps[1].value == "g at delaying"
    assert rules[2].enabled is False
    assert [r.rule_idx for r in rules] == [0, 1, 2]


def test_prefilter_literal_extraction():
    from logeventprocessor_spark.operators.match import prefilter_literal

    assert prefilter_literal(r".*hello ([^\s]+) world.*") in ("hello ", " world")
    assert prefilter_literal(r".*\[ERROR\].*") == "[error]"
    assert prefilter_literal(r"([^\s]+) tells you, '(.+)'") == " tells you, '"
    assert prefilter_literal(r".*Attack my minions.*") == "attack my minions"


def test_prefilter_literal_safety():
    from logeventprocessor_spark.operators.match import prefilter_literal

    # alternation: a branch literal is not required -> no prefilter
    assert prefilter_literal(r"(foo|barbaz)") is None
    assert prefilter_literal(r"abc|def") is None
    # optional last atom: trimmed
    assert prefilter_literal(r"abcde?f") in ("abcd", None)
    assert prefilter_literal(r"abcde*") == "abcd"
    assert prefilter_literal(r"abcde{0,3}") == "abcd"
    # {1,...} keeps the atom required
    assert prefilter_literal(r"abcde{1,3}") == "abcde"
    # too short -> None
    assert prefilter_literal(r"ab.*") is None


def test_prefilter_never_drops_matches():
    """Property: any string matching the pattern contains the literal
    (case-insensitively)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logeventprocessor_spark.operators.match import prefilter_literal
    from logeventprocessor_spark.rules import canonical_rules, document_rules

    rules = canonical_rules() + document_rules()
    pats = [(re.compile(r.pattern, re.IGNORECASE), prefilter_literal(r.pattern))
            for r in rules]

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
    def check(s):
        for pat, lit in pats:
            if lit is not None and pat.search(s):
                assert lit in s.lower()

    check()


def test_prefilter_optional_group_guard():
    from logeventprocessor_spark.operators.match import prefilter_literal

    assert prefilter_literal(r"(abc)?defg") is None  # abc is optional
    assert prefilter_literal(r"(?:abcd)*xy") is None
