#!/usr/bin/env python3
"""TEST ORACLE DRIVER — runs the LIVE reference (DDMAL/text_alignment).

This file is differential-test tooling, NOT part of the engine: it imports
/root/reference/textSeqCompare.py and latinSyllabification.py directly
(matplotlib/unidecode stubbed) and replays the reference's own
abbreviation-expansion + gap-insertion + span-projection loop
(alignToOCR.py:251-324) with unit char boxes so reference OUTPUTS can be
captured as goldens. The replay deliberately mirrors the reference line by
line — that is the point of an oracle driver; the Scala engine under test
shares no code with it. Output format matches graft.tools.KernelCli.
"""
import sys, types, re

# stub unimportable deps
for name in ("matplotlib", "matplotlib.pyplot", "unidecode"):
    m = types.ModuleType(name)
    if name == "unidecode":
        m.unidecode = lambda x: x
    sys.modules[name] = m
sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]

sys.path.insert(0, "/root/reference")
import textSeqCompare as tsc
import latinSyllabification as latsyl


class CharBox(object):
    __slots__ = ["char", "ul", "lr", "ulx", "lrx", "uly", "lry"]

    def __init__(self, char, ul=None, lr=None):
        self.char = char
        if ul is None or lr is None:
            self.ul = None
            self.lr = None
            return
        self.ul = tuple(ul)
        self.lr = tuple(lr)
        self.ulx, self.uly = ul
        self.lrx, self.lry = lr


def process(transcript, noisy, scoring_system=None):
    all_chars = [CharBox(c, (k, 0), (k + 1, 1)) for k, c in enumerate(noisy)]

    # alignToOCR.py:251-264
    abbreviations = latsyl.abbreviations
    for abb in abbreviations.keys():
        while True:
            ocr_str = "".join(str(x.char) for x in all_chars)
            idx = ocr_str.find(abb)
            if idx == -1:
                break
            ins = []
            for i, segment in enumerate(abbreviations[abb]):
                split_box = all_chars[i + idx]
                ins += [CharBox(x, split_box.ul, split_box.lr) for x in segment]
            all_chars = all_chars[:idx] + ins + all_chars[idx + len(abb):]

    ocr = "".join(x.char for x in all_chars)
    tra_align, ocr_align = tsc.perform_alignment(list(transcript), list(ocr), scoring_system)
    tra_align = "".join(tra_align)
    ocr_align = "".join(ocr_align)
    syls = latsyl.syllabify_text(transcript)

    # alignToOCR.py:285-292
    for i, char in enumerate(ocr_align):
        if char == "_":
            all_chars.insert(i, CharBox("_"))
    assert len(all_chars) == len(tra_align)

    # alignToOCR.py:297-324
    current_offset = 0
    syl_boxes = []
    for syl in syls:
        if len(syl) < 1:
            continue
        elif len(syl) == 1:
            syl_regex = syl
        else:
            syl_regex = syl[0] + syl[1:-1].replace("", "_*") + syl[-1]
        syl_match = re.search(syl_regex, tra_align[current_offset:])
        if syl_match is None:
            continue  # reference would crash; generator avoids this
        start = syl_match.start() + current_offset
        end = syl_match.end() + current_offset
        current_offset = end
        align_boxes = [x for x in all_chars[start:end] if x.lr is not None]
        if not align_boxes:
            continue
        if len(set(x.uly for x in align_boxes)) > 1:
            lower = max(x.uly for x in align_boxes)
            align_boxes = [b for b in align_boxes if b.uly == lower]
        ul = (min(x.ulx for x in align_boxes), min(x.uly for x in align_boxes))
        lr = (max(x.lrx for x in align_boxes), max(x.lry for x in align_boxes))
        syl_boxes.append((syl, ul, lr))
    return tra_align, ocr_align, syls, syl_boxes


def main(inp, outp):
    out_lines = []
    with open(inp) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            transcript = parts[0]
            noisy = parts[1] if len(parts) > 1 else ""
            ta, oa, syls, boxes = process(transcript, noisy)
            spans = ";".join(
                "%s:%d:%d:%d:%d" % (s, ul[0], ul[1], lr[0], lr[1]) for s, ul, lr in boxes
            )
            out_lines.append("%s\t%s\t%s\t%s" % (ta, oa, ",".join(syls), spans))
    with open(outp, "w") as f:
        f.write("\n".join(out_lines) + ("\n" if out_lines else ""))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
