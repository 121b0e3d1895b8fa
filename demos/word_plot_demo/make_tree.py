"""Build the demo sample tree (mirrors the reference's demo3 layout:
grouped runs with mixed-format numeric files + a label dict)."""

from pathlib import Path


def build(root: str) -> None:
    rootp = Path(root)
    for grp, runs in {"group_A": ["run1", "run2"], "group_B": ["run1"]}.items():
        for i, run in enumerate(runs):
            d = rootp / grp / run
            d.mkdir(parents=True, exist_ok=True)
            (d / "data.txt").write_text(f"{i + 1} {i + 2} {i + 3}\n# comment\n{i + 4}.5 bad\n")
            (d / "data.csv").write_text(f"v,label\n{10 * (i + 1)},x\n{20 * (i + 1)},y\n")
            (d / "data.json").write_text(f'{{"values": [{100 * (i + 1)}, {200 * (i + 1)}]}}')
    (rootp / "group_A" / "_dict.txt").write_text("run1 Baseline\nrun2 Variant\n")


if __name__ == "__main__":
    import sys

    build(sys.argv[1] if len(sys.argv) > 1 else "demos/word_plot_demo/sample_tree")
    print("tree built")
