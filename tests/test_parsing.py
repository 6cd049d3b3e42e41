"""Golden tests for timestamp/text parsing (reference:
dataset_process_scripts/load_dataset_utils.py, data/common_utils.py)."""

from video_chapter_generation_tpu.datasetkit import (
    clean_str,
    extract_first_timestamp,
    extract_timestamp,
    remove_timestamp,
    text_decontracted,
)


def test_extract_timestamp_formats():
    assert extract_timestamp("01:02:03 intro")[:2] == ("01:02:03", 3723)
    assert extract_timestamp("1:02:03 intro")[:2] == ("1:02:03", 3723)
    assert extract_timestamp("12:34 topic")[:2] == ("12:34", 754)
    assert extract_timestamp("1:05 x")[:2] == ("1:05", 65)
    assert extract_timestamp("no time here") == ("", -1, -1, -1)


def test_extract_timestamp_prefers_long_form():
    # HH:MM:SS wins over its MM:SS suffix
    ts, sec, si, ei = extract_timestamp("chapter at 10:20:30 end")
    assert ts == "10:20:30" and sec == 10 * 3600 + 20 * 60 + 30


def test_extract_first_timestamp_range_line():
    # multiple timestamps on one line -> earliest wins, all removed
    sec, desc = extract_first_timestamp("Stack 2 7:08-11:31")
    assert sec == 7 * 60 + 8
    assert "7:08" not in desc and "11:31" not in desc
    assert "Stack 2" in desc


def test_extract_first_timestamp_single():
    sec, desc = extract_first_timestamp("0:46 introduction")
    assert sec == 46
    assert desc.strip() == "introduction"


def test_remove_timestamp():
    assert remove_timestamp("2:25 distilled vs tap water") == "distilled vs tap water"
    assert remove_timestamp("no timestamps") == "no timestamps"


def test_clean_str():
    assert clean_str("** Intro! **") == "Intro"
    # no alnum at all: indices never move, string passes through unchanged
    assert clean_str("!!!") == "!!!"
    assert clean_str("abc") == "abc"
    assert clean_str("  #1 tip.  ") == "1 tip"


def test_text_decontracted():
    assert text_decontracted("won't") == "will not"
    assert text_decontracted("can't stop") == "can not stop"
    assert text_decontracted("it's fine") == "it us fine"  # reference quirk: t's -> t us
    assert text_decontracted("I'm here") == "I am here"
    assert text_decontracted("they're done") == "they are done"
