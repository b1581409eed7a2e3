"""Build a PDF preview of paper/main.tex without a TeX toolchain.

`make paper` prefers pdflatex/latexmk; this image ships neither, so this
fallback renders a faithful preview (title, abstract, section text, the
generated tables as monospace panels, and the committed figure PNGs) to
paper/main.pdf via matplotlib's PdfPages. The .tex source remains the
ground truth for a real TeX build.
"""

from __future__ import annotations

import os
import re
import textwrap

import matplotlib

matplotlib.use("Agg")
import matplotlib.image as mpimg  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.backends.backend_pdf import PdfPages  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _detex(s: str) -> str:
    s = re.sub(r"\\(emph|textbf|texttt|text)\{([^}]*)\}", r"\2", s)
    s = re.sub(r"\\(ref|label|cite)\{([^}]*)\}", r"[\2]", s)
    s = re.sub(r"\$([^$]*)\$", r"\1", s)
    s = s.replace(r"\\", " ").replace("~", " ").replace(r"\,", " ")
    s = re.sub(r"\\[a-zA-Z]+", "", s)
    s = s.replace("{", "").replace("}", "").replace("---", "--")
    return re.sub(r"[ \t]+", " ", s)


def parse_tex(path: str):
    src = open(path).read()
    title = re.search(r"\\title\{(.*?)\}\n", src, re.S)
    abstract = re.search(r"\\begin\{abstract\}(.*?)\\end\{abstract\}", src,
                         re.S)
    sections = re.findall(
        r"\\(sub)?section\{([^}]*)\}(.*?)(?=\\(?:sub)?section\{|"
        r"\\input|\\begin\{figure\}|\\begin\{thebibliography\})",
        src, re.S)
    tables = re.findall(r"\\input\{([^}]*)\}", src)
    figures = re.findall(r"\\includegraphics\[[^]]*\]\{([^}]*)\}", src)
    return {
        "title": _detex(title.group(1)) if title else "",
        "abstract": _detex(abstract.group(1)).strip() if abstract else "",
        "sections": [(("  " if sub else "") + _detex(name),
                      _detex(body).strip())
                     for sub, name, body in sections],
        "tables": [os.path.normpath(os.path.join(HERE, t)) for t in tables],
        "figures": figures,
    }


def tabular_to_text(path: str) -> str:
    """Flatten a booktabs tabular into aligned monospace text."""
    rows = []
    for line in open(path):
        line = line.strip()
        if "&" in line and not line.startswith("%"):
            cells = [_detex(c).replace(r"\\", "").strip()
                     for c in line.rstrip("\\").split("&")]
            rows.append(cells)
    cap = re.search(r"\\caption\{([^}]*)\}", open(path).read())
    if not rows:
        return ""
    ncol = max(len(r) for r in rows)
    rows = [r + [""] * (ncol - len(r)) for r in rows]
    widths = [max(len(r[i]) for r in rows) for i in range(ncol)]
    out = [(cap and _detex(cap.group(1))) or os.path.basename(path), ""]
    for j, r in enumerate(rows):
        out.append("  ".join(c.ljust(w) for c, w in zip(r, widths)))
        if j == 0:
            out.append("  ".join("-" * w for w in widths))
    return "\n".join(out)


def build(out_path: str):
    doc = parse_tex(os.path.join(HERE, "main.tex"))
    with PdfPages(out_path) as pdf:
        # page 1: title + abstract + body text
        fig = plt.figure(figsize=(8.5, 11))
        fig.text(0.5, 0.95, "\n".join(textwrap.wrap(doc["title"], 60)),
                 ha="center", va="top", fontsize=16, weight="bold")
        y = 0.86
        fig.text(0.5, y, "PREVIEW BUILD (no TeX toolchain; see main.tex)",
                 ha="center", fontsize=8, color="gray")
        y -= 0.03
        fig.text(0.1, y, "Abstract", fontsize=12, weight="bold")
        y -= 0.02
        for line in textwrap.wrap(doc["abstract"], 95):
            fig.text(0.1, y, line, fontsize=9)
            y -= 0.016
        pdf.savefig(fig)
        plt.close(fig)

        fig = plt.figure(figsize=(8.5, 11))
        y = 0.95
        for name, body in doc["sections"]:
            if y < 0.1:
                pdf.savefig(fig)
                plt.close(fig)
                fig = plt.figure(figsize=(8.5, 11))
                y = 0.95
            fig.text(0.1, y, name, fontsize=12, weight="bold")
            y -= 0.022
            for line in textwrap.wrap(body, 100)[:40]:
                fig.text(0.1, y, line, fontsize=8.5)
                y -= 0.014
            y -= 0.015
        pdf.savefig(fig)
        plt.close(fig)

        for tpath in doc["tables"]:
            if not os.path.exists(tpath):
                continue
            txt = tabular_to_text(tpath)
            fig = plt.figure(figsize=(11, 8.5))
            fig.text(0.05, 0.95, txt, fontsize=8, family="monospace",
                     va="top")
            pdf.savefig(fig)
            plt.close(fig)

        for fname in doc["figures"]:
            png = os.path.join(REPO, "results", "figures",
                               fname.replace(".pdf", ".png"))
            if not os.path.exists(png):
                continue
            img = mpimg.imread(png)
            fig = plt.figure(figsize=(8.5, 11))
            ax = fig.add_axes([0.05, 0.2, 0.9, 0.7])
            ax.imshow(img)
            ax.axis("off")
            ax.set_title(fname)
            pdf.savefig(fig)
            plt.close(fig)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    build(os.path.join(HERE, "main.pdf"))
