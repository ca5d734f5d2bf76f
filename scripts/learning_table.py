"""Render LEARNING.json as the README markdown learning table.

Usage: python scripts/learning_table.py [LEARNING.json]
Prints a markdown table (task | envs | epochs | final/best reward |
sentinels) built from the machine-readable record, so the README table
and LEARNING.json can never drift apart.
"""

import json
import os
import sys

import yaml

CFG = os.path.join(
    os.path.dirname(__file__), "..", "omniisaacgymenvs_tpu", "cfg"
)


def num_envs(task: str) -> str:
    """numEnvs from the task yaml, following `defaults:` inheritance
    (e.g. ShadowHandOpenAI_LSTM <- ShadowHandOpenAI_FF)."""
    p = os.path.join(CFG, "task", f"{task}.yaml")
    try:
        with open(p) as f:
            d = yaml.safe_load(f)
        n = d.get("env", {}).get("numEnvs")
        if n is None:
            for base in d.get("defaults", []):
                if isinstance(base, str) and base != "_self_":
                    return num_envs(base)
        return str(n) if n is not None else "?"
    except Exception:
        return "?"


def envs_label(task: str) -> str:
    """numEnvs label; campaign variants that override the yaml value
    (e.g. ShadowHand_DR at the reference's DR scale) are listed here."""
    overrides = {"ShadowHand_DR": "16384"}
    if task in overrides:
        return overrides[task]
    return num_envs(task)


def render(rows: dict) -> list:
    """Markdown table lines for a LEARNING.json dict."""
    lines = [
        "| Task | envs | epochs | final reward | best | ep_len | "
        "sentinel | train steps/s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for task, r in rows.items():
        sent = ""
        if "consecutive_successes" in r:
            sent = (f"consec. successes {r['consecutive_successes']} "
                    f"(best {r['best_consecutive_successes']})")
        elif "terrain_level" in r:
            sent = (f"terrain level {r['terrain_level']} "
                    f"(best {r['best_terrain_level']})")
        lines.append(
            f"| {task} | {envs_label(task)} | {r['epochs']} "
            f"| {r['final_ep_reward']} | {r['best_ep_reward']} "
            f"| {r['final_ep_length']} | {sent} "
            f"| {r['steps_per_sec']:,.0f} |"
        )
    return lines


def update_readme(readme_path: str = "README.md",
                  record_path: str = "LEARNING.json") -> None:
    """Splice the regenerated table over the existing one in README.md
    (located by its header row) so the two can never drift."""
    with open(record_path) as f:
        rows = json.load(f)
    table = render(rows)
    with open(readme_path) as f:
        lines = f.read().splitlines()
    start = next(
        (i for i, l in enumerate(lines) if l.startswith("| Task | envs |")),
        None,
    )
    if start is None:
        raise SystemExit(
            f"learning table header row ('| Task | envs |') not found in "
            f"{readme_path}; cannot splice the regenerated table"
        )
    end = start
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    lines[start:end] = table
    with open(readme_path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    if "--update-readme" in sys.argv:
        update_readme()
        return
    path = sys.argv[1] if len(sys.argv) > 1 else "LEARNING.json"
    with open(path) as f:
        rows = json.load(f)
    for line in render(rows):
        print(line)


if __name__ == "__main__":
    main()
