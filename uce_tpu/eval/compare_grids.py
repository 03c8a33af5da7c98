"""Side-by-side comparison grids — evalscripts/make-compare-images.py.

Generalized: instead of the reference's hard-coded ESD folder-suffix
variants (``make-compare-images.py:15-27``), any list of labeled folders is
paneled per case into one PNG.
"""

from __future__ import annotations

import os
import re


def make_grids(
    folders: list[str],
    labels: list[str] | None,
    save_path: str,
    num_samples: int = 1,
    from_case: int = 0,
    till_case: int = 1_000_000,
) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from uce_tpu.utils.imaging import load_image

    labels = labels or [os.path.basename(f.rstrip("/")) for f in folders]
    os.makedirs(save_path, exist_ok=True)

    cases = set()
    for name in os.listdir(folders[0]):
        m = re.match(r"(\d+)_(\d+)\.png", name)
        if m and from_case <= int(m.group(1)) <= till_case:
            cases.add(int(m.group(1)))

    n = 0
    for case in sorted(cases):
        fig, axes = plt.subplots(
            num_samples, len(folders),
            figsize=(3 * len(folders), 3 * num_samples), squeeze=False)
        ok = True
        for col, (folder, label) in enumerate(zip(folders, labels)):
            for row in range(num_samples):
                path = os.path.join(folder, f"{case}_{row}.png")
                ax = axes[row][col]
                ax.axis("off")
                if not os.path.exists(path):
                    ok = False
                    continue
                ax.imshow(load_image(path))
                if row == 0:
                    ax.set_title(label, fontsize=10)
        if ok:
            fig.savefig(os.path.join(save_path, f"{case}.png"),
                        bbox_inches="tight", dpi=100)
            n += 1
        plt.close(fig)
    return n


def register_cli(sub) -> None:
    p = sub.add_parser("eval-compare",
                       help="side-by-side grids across model variants")
    p.add_argument("--folders", type=str, nargs="+", required=True)
    p.add_argument("--labels", type=str, nargs="+", default=None)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    n = make_grids(args.folders, args.labels, args.save_path,
                   num_samples=args.num_samples, from_case=args.from_case,
                   till_case=args.till_case)
    print(f"wrote {n} comparison grids to {args.save_path}")
    return 0
