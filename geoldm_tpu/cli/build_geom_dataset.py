"""Extract GEOM-Drugs conformers from the crude msgpack dump.

Equivalent of the reference's `python build_geom_dataset.py` entry point
(build_geom_dataset.py:236-244): keeps the K lowest-energy conformers per
molecule and writes the packed (mol_id, atomic_number, xyz) array + SMILES
list + per-conformer atom counts.

  python -m geoldm_tpu.cli.build_geom_dataset --data_dir data/geom \
      --conformations 30
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="geoldm-tpu GEOM extraction")
    p.add_argument("--conformations", type=int, default=30,
                   help="max conformations kept per molecule")
    p.add_argument("--remove_h", action="store_true")
    p.add_argument("--data_dir", type=str, default="data/geom")
    p.add_argument("--data_file", type=str, default="drugs_crude.msgpack")
    p.add_argument("--no_native", action="store_true",
                   help="force the Python extractor (default: use the "
                        "streaming C++ extractor when it builds; identical "
                        "outputs, parity-tested)")
    args = p.parse_args(argv)

    from geoldm_tpu.data import native_geom
    from geoldm_tpu.data.geom import extract_conformers

    if not args.no_native and native_geom.available():
        out = native_geom.extract_conformers_native(
            args.data_dir, args.data_file, args.conformations, args.remove_h
        )
    else:
        if not args.no_native:
            print("native extractor unavailable; using the Python path")
        out = extract_conformers(
            args.data_dir, args.data_file, args.conformations, args.remove_h
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
