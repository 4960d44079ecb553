"""Stage 6 (optional) -- per-isoform visualization.

Equivalent of the reference's freddie_plot.py: for every tint/partition/
isoform, draw member reads' alignment intervals against the tint's
segments and the annotation transcripts that overlap it, one page per
isoform, merged into one PDF per partition.

Differences from the reference (intentional):
- multi-page PDFs use matplotlib.backends.PdfPages (the reference shells
  through per-isoform PDFs + PyPDF2, py/freddie_plot.py:481-487);
- the transcript-name filter is a parameter (the reference hardcodes its
  dev gene's names 'AR-UNION'/'AR-204'/... at py/freddie_plot.py:413);
  default: all annotation transcripts overlapping the tint.
"""

from __future__ import annotations

import os
import re
from itertools import groupby

COLORS = [
    "#a6cee3", "#1f78b4", "#b2df8a", "#33a02c", "#fb9a99", "#e31a1c",
    "#fdbf6f", "#ff7f00", "#cab2d6", "#6a3d9a", "#ffff99", "#b15928",
]
GRID_WIDTH_RATIOS = [
    (5000, 9), (2000, 8), (1000, 7), (500, 6), (200, 5), (100, 4),
    (50, 3), (20, 2), (0, 2),
]


def parse_annotation_gtf(path: str) -> dict:
    """transcript_id -> {chrom, name, intervals, enum} from exon records."""
    transcripts: dict = {}
    for line in open(path):
        if line[0] == "#":
            continue
        f = line.rstrip("\n").split("\t")
        if f[2] != "exon":
            continue
        m = re.search(r'transcript_id "(?P<tid>[^"]+)"', f[8])
        if not m:
            continue
        tid = m.group("tid")
        nm = re.search(r'transcript_name "(?P<tname>[^"]+)"', f[8])
        en = re.search(r'exon_number "(?P<enum>[^"]+)"', f[8])
        t = transcripts.setdefault(
            tid,
            dict(chrom=f[0], intervals=[], enum=[], name=nm.group("tname") if nm else tid),
        )
        t["intervals"].append((int(f[3]), int(f[4])))
        t["enum"].append(en.group("enum") if en else str(len(t["enum"]) + 1))
    return transcripts


def data_to_intervals(segs, data: str):
    """Genomic intervals of the '1'-runs of a data string over segments."""
    out = []
    for d, grp in groupby(enumerate(data), lambda t: t[1]):
        if d != "1":
            continue
        grp = list(grp)
        out.append((segs[grp[0][0]][0], segs[grp[-1][0]][1]))
    return out


def load_tints(cluster_tsv: str, segment_tsv: str, tint_ids=frozenset()) -> dict:
    """Join cluster + segment TSVs into per-tint partition/isoform read
    groups (the reference's get_tints, py/freddie_plot.py:312-396)."""
    rid_to_data = {}
    for line in open(segment_tsv):
        if line[0] == "#":
            continue
        f = line.rstrip("\n").split("\t")
        rid_to_data[int(f[0])] = f[5]
    tints: dict = {}
    for line in open(cluster_tsv):
        if line.startswith("#"):
            chrom, tid_s, seg_s = line.rstrip("\n")[1:].split("\t")
            tint_id = int(tid_s)
            if tint_ids and tint_id not in tint_ids:
                continue
            pos = seg_s.split(",")
            segs = [(int(s), int(e)) for s, e in zip(pos[:-1], pos[1:])]
            tints[tint_id] = dict(id=tint_id, chrom=chrom, segs=segs, partitions={})
        elif line.startswith("isoform_"):
            continue
        else:
            f = line.rstrip("\n").split("\t")
            tint = int(f[4])
            if tint not in tints:
                continue
            rid = int(f[0])
            pid = int(f[5])
            iid = "garbage" if f[7] == "*" else f[7]
            part = tints[tint]["partitions"].setdefault(
                pid, dict(id=pid, isoforms={})
            )
            iso = part["isoforms"].setdefault(iid, dict(id=iid, reads=[]))
            data = rid_to_data[rid]
            iso["reads"].append(
                dict(
                    rid=rid,
                    name=f[1],
                    strand=f[3],
                    tail=f[6],
                    data=data,
                    intervals=data_to_intervals(tints[tint]["segs"], data),
                )
            )
    # consensus interval track per isoform
    for tint in tints.values():
        for part in tint["partitions"].values():
            for iso in part["isoforms"].values():
                M = len(tint["segs"])
                votes = [0] * M
                for read in iso["reads"]:
                    for j in range(M):
                        votes[j] += read["data"][j] == "1"
                cons = "".join(
                    "1" if v / len(iso["reads"]) > 0.3 else "0" for v in votes
                )
                iso["cons_intervals"] = data_to_intervals(tint["segs"], cons)
    return tints


def plot_tint(tint: dict, transcripts: dict, out_dir: str, name_filter=None) -> list[str]:
    """One PDF per partition; returns the written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages
    from matplotlib import patches

    os.makedirs(out_dir, exist_ok=True)
    tint_s, tint_e = tint["segs"][0][0], tint["segs"][-1][1]
    overlapping = [
        tid
        for tid, tr in transcripts.items()
        if tr["chrom"] == tint["chrom"]
        and tr["intervals"][0][0] <= tint_e
        and tint_s <= tr["intervals"][-1][1]
        and (name_filter is None or tr["name"] in name_filter)
    ]
    overlapping.sort(key=lambda tid: transcripts[tid]["name"])
    tid_colors = {
        tid: COLORS[i % len(COLORS)] for i, tid in enumerate(overlapping)
    }
    written = []
    for pid, part in sorted(tint["partitions"].items()):
        path = os.path.join(out_dir, f"{pid}.pdf")
        with PdfPages(path) as pdf:
            for iid, iso in sorted(part["isoforms"].items(), key=lambda kv: str(kv[0])):
                fig, (ax_t, ax_r) = plt.subplots(
                    2, 1, figsize=(16, 9),
                    gridspec_kw=dict(height_ratios=[1, 4]), sharex=True,
                )
                title = (
                    f"tint {tint['id']}, partition {pid}, isoform {iid} "
                    f"(n={len(iso['reads'])})"
                )
                ax_t.set_title(title)
                # annotation tracks + consensus
                for p, tid in enumerate(overlapping):
                    for s, e in transcripts[tid]["intervals"]:
                        ax_t.add_patch(
                            patches.Rectangle((s, p), e - s, 0.8, color=tid_colors[tid])
                        )
                for s, e in iso["cons_intervals"]:
                    ax_t.add_patch(
                        patches.Rectangle((s, len(overlapping)), e - s, 0.8, color="black")
                    )
                ax_t.set_ylim(0, len(overlapping) + 1)
                ax_t.set_yticks([p + 0.4 for p in range(len(overlapping) + 1)])
                ax_t.set_yticklabels(
                    [transcripts[t]["name"] for t in overlapping] + ["consensus"]
                )
                # read tracks
                for p, read in enumerate(
                    sorted(iso["reads"], key=lambda r: (r["name"], r["data"]))
                ):
                    for s, e in read["intervals"]:
                        ax_r.add_patch(
                            patches.Rectangle((s, p), e - s, 0.9, color="#1f78b4")
                        )
                ax_r.set_ylim(0, max(len(iso["reads"]), 1))
                ax_r.set_xlim(tint_s, tint_e)
                ax_r.set_ylabel("reads")
                for s, _e in tint["segs"]:
                    ax_r.axvline(s, color="gray", lw=0.3, alpha=0.5)
                pdf.savefig(fig)
                plt.close(fig)
        written.append(path)
    return written


def run_plot(
    annotation_gtf: str,
    segment_tsv: str,
    cluster_tsv: str,
    out_dir: str,
    tint_ids=frozenset(),
    name_filter=None,
) -> int:
    transcripts = parse_annotation_gtf(annotation_gtf)
    tints = load_tints(cluster_tsv, segment_tsv, tint_ids=set(tint_ids))
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for tint in tints.values():
        n += len(
            plot_tint(
                tint, transcripts, os.path.join(out_dir, str(tint["id"])), name_filter
            )
        )
    return n
