#!/usr/bin/env python3
"""Generate the Python-golden corpus for TextNorm parity (SURVEY 7.5.2).

Runs the reference's EXACT normalizer lines (mapper/main.py:56-60):

    processed = re.sub(r'\\s+', ' ', content).lower()
    processed = re.sub(r'[^a-zA-Z0-9\\s]', '', processed)
    words = processed.split()

over a corpus of Unicode edge cases and writes one JSON object per line
{"text": ..., "tokens": [...]} to src/test/resources/textnorm_golden.jsonl.
The checked-in artifact is the contract; re-run this script only to
extend the corpus.
"""
import json
import re

CASES = [
    "hello world",
    "Hello\u00a0World",                 # NBSP between words
    "caf\u00e9 con leche",              # precomposed e-acute
    "cafe\u0301 au lait",               # combining acute
    "\u00c9COLE NORMALE",               # uppercase accented
    "Stra\u00dfe und Weg",              # sharp s
    "\u0130stanbul lower dotted I",     # Turkish dotted capital I
    "\u6570\u636e \u5904\u7406 data",   # CJK + space
    "tabs\tand\nnewlines\r\nmixed",
    "em\u2003space and thin\u2009space",  # U+2003 / U+2009
    "NEL\u0085separator",               # U+0085 next line
    "ideographic\u3000space",           # U+3000
    "zero\u200bwidth space",            # U+200B is NOT whitespace
    "file\u001cseparator ctrl",         # U+001C: Python whitespace, not Unicode WS
    "group\u001dsep and record\u001esep and unit\u001fsep",
    "punct,.:;!?(){}[]#@$%^&*-_=+words",
    "digits 123 mixed a1b2c3",
    "  leading and trailing  ",
    "multiple     internal     runs",
    "emoji \U0001f600 in text",
    "na\u00efve r\u00e9sum\u00e9s",
    "Data\u00a0Science\u00a0Pipeline",
    "\u00bfqu\u00e9 tal? \u00a1bien!",
    "vertical\u000btab and form\u000cfeed",
    "",
    "   ",
    "...",
    "ALLCAPS MiXeD lower",
]

def reference_tokens(content: str):
    processed = re.sub(r'\s+', ' ', content).lower()
    processed = re.sub(r'[^a-zA-Z0-9\s]', '', processed)
    return processed.split()

if __name__ == "__main__":
    out = "src/test/resources/textnorm_golden.jsonl"
    with open(out, "w", encoding="utf-8") as f:
        for text in CASES:
            f.write(json.dumps(
                {"text": text, "tokens": reference_tokens(text)},
                ensure_ascii=True) + "\n")
    print(f"wrote {len(CASES)} cases to {out}")
