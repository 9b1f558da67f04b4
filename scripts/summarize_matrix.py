"""Collect the v1-vs-v2 feature-matrix eval blocks from /tmp/matrix logs
into a markdown table (PERF.md evidence)."""
import os
import re
import sys

VARIANTS = ["plain", "smoothl1", "bounded", "indfit", "jointfit", "jb",
            "v2full"]
LABELS = {"plain": "plain (no bbox reg)",
          "smoothl1": "+bbox reg (smooth-L1)",
          "bounded": "+bounded IoU",
          "indfit": "+independent fitness",
          "jointfit": "+joint fitness",
          "jb": "+jointfit +bounded (v2 head)",
          "v2full": "v2 full (+corner clustering)"}


def parse(log_dir="/tmp/matrix"):
    rows = []
    pat = re.compile(
        r"VOC mAP@0\.5 = ([\d.]+) \| COCO mAP@\[\.5:\.95\] = ([\d.]+)"
        r"\s+@0\.5 = ([\d.]+)\s+@0\.75 = ([\d.]+)")
    strata = re.compile(
        r"small ([\d.]+)\s+medium ([\d.]+)\s+large ([\d.]+)\s+\|\s+"
        r"vis>=0\.5 ([\d.]+)\s+occluded ([\d.]+)")
    for v in VARIANTS:
        fn = os.path.join(log_dir, v + ".log")
        if not os.path.isfile(fn):
            continue
        text = open(fn).read()
        ms = pat.findall(text)
        ss = strata.findall(text)
        for tag, i in (("hard", 0), ("soft", 1)):
            if i < len(ms):
                rows.append((v, tag, [float(x) for x in ms[i]],
                             [float(x) for x in ss[i]] if i < len(ss)
                             else None))
    return rows


def main():
    rows = parse(sys.argv[1] if len(sys.argv) > 1 else "/tmp/matrix")
    print("| variant | NMS | VOC@0.5 | COCO mAP | @0.5 | @0.75 | small | "
          "med | large | vis>=.5 | occl |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for v, tag, m, s in rows:
        srow = ("%.3f | %.3f | %.3f | %.3f | %.3f" % tuple(s)) if s else \
            "- | - | - | - | -"
        print("| %s | %s | %.4f | **%.4f** | %.4f | %.4f | %s |" % (
            LABELS.get(v, v), tag, m[0], m[1], m[2], m[3], srow))


if __name__ == "__main__":
    main()
