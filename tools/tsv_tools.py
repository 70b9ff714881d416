#!/usr/bin/env python
"""TSV dataset toolkit CLI (reference utils/tsv_file_ops.py, SURVEY §2.15).

Subcommands:
    lineidx   <file.tsv>                rebuild the .lineidx sidecar
    from-folder <img_root> <out.tsv>    encode an image-folder dataset into
                                        key<TAB>label<TAB>base64 rows
    hw        <file.tsv>                generate the height/width sidecar
    labelmap  <label.tsv>               collect the class set
    linelist  <label.tsv>               rows with at least one ground truth
    head      <file.tsv> [n]            print the first n row keys/labels

Offline curation (reference tsv_file_ops.py:105-294):
    extract-column <file.tsv> [--col N] [--out F]   keep [key, col] per row
    remove-column  <file.tsv> [--col N] [--out F]   drop one column
    merge-labels   <a.tsv> <b.tsv> [--out F]        concat JSON label lists
    merge-fields   <a.tsv> <b.tsv> <out.tsv>        merge per-box dict fields
    remove-fields  <in.tsv> <out.tsv> <field>...    delete per-box fields
    sort-by-keys   <ref.tsv> <file.tsv> [--out F]   reorder rows to ref keys
    same-keys      <a.tsv> <b.tsv>                  check key alignment
"""
from __future__ import annotations

import argparse
import os
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))

from vil_tpu.data import tsv as T  # noqa: E402
from vil_tpu.data.datasets import ImageFolder  # noqa: E402


def cmd_lineidx(args):
    idx = op.splitext(args.tsv)[0] + ".lineidx"
    T.create_lineidx(args.tsv, idx)
    print(f"wrote {idx}")


def cmd_from_folder(args):
    ds = ImageFolder(args.root)

    def rows():
        for path, target in ds.samples:
            from PIL import Image

            with Image.open(path) as img:
                b64 = T.encode_image_to_base64(img.convert("RGB"))
            yield [op.relpath(path, args.root), target, b64]

    T.tsv_writer(rows(), args.out)
    print(f"wrote {args.out} ({len(ds)} rows, {len(ds.class_to_idx)} classes)")


def cmd_hw(args):
    print(f"wrote {T.generate_hw_file(args.tsv)}")


def cmd_labelmap(args):
    print(f"wrote {T.generate_labelmap_file(args.tsv)}")


def cmd_linelist(args):
    print(f"wrote {T.generate_linelist_file(args.tsv)}")


def cmd_head(args):
    tf = T.TSVFile(args.tsv, generate_lineidx=True)
    for i in range(min(args.n, tf.num_rows())):
        row = tf.seek(i)
        print("\t".join(row[:2]) + (f"\t<{len(row[-1])}b payload>" if len(row) > 2 else ""))


def cmd_extract_column(args):
    print(f"wrote {T.extract_column(args.tsv, args.col, args.out)}")


def cmd_remove_column(args):
    print(f"wrote {T.remove_column(args.tsv, args.col, args.out)}")


def cmd_merge_labels(args):
    print(f"wrote {T.merge_two_label_files(args.a, args.b, args.out)}")


def cmd_merge_fields(args):
    print(f"wrote {T.merge_label_fields(args.a, args.b, args.out)}")


def cmd_remove_fields(args):
    print(f"wrote {T.remove_label_fields(args.tsv, args.out, args.fields)}")


def cmd_sort_by_keys(args):
    out = T.sort_file_based_on_keys(args.ref, args.tsv, args.out)
    print(f"wrote {out}" if out != args.tsv
          else "file keys are the same, skip sorting")


def cmd_same_keys(args):
    same = T.is_same_keys_for_files(args.a, args.b)
    print("same" if same else "DIFFERENT")
    raise SystemExit(0 if same else 1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("lineidx"); s.add_argument("tsv"); s.set_defaults(fn=cmd_lineidx)
    s = sub.add_parser("from-folder"); s.add_argument("root"); s.add_argument("out")
    s.set_defaults(fn=cmd_from_folder)
    s = sub.add_parser("hw"); s.add_argument("tsv"); s.set_defaults(fn=cmd_hw)
    s = sub.add_parser("labelmap"); s.add_argument("tsv"); s.set_defaults(fn=cmd_labelmap)
    s = sub.add_parser("linelist"); s.add_argument("tsv"); s.set_defaults(fn=cmd_linelist)
    s = sub.add_parser("head"); s.add_argument("tsv")
    s.add_argument("n", nargs="?", type=int, default=5); s.set_defaults(fn=cmd_head)
    s = sub.add_parser("extract-column"); s.add_argument("tsv")
    s.add_argument("--col", type=int, default=1); s.add_argument("--out")
    s.set_defaults(fn=cmd_extract_column)
    s = sub.add_parser("remove-column"); s.add_argument("tsv")
    s.add_argument("--col", type=int, default=1); s.add_argument("--out")
    s.set_defaults(fn=cmd_remove_column)
    s = sub.add_parser("merge-labels"); s.add_argument("a"); s.add_argument("b")
    s.add_argument("--out"); s.set_defaults(fn=cmd_merge_labels)
    s = sub.add_parser("merge-fields"); s.add_argument("a"); s.add_argument("b")
    s.add_argument("out"); s.set_defaults(fn=cmd_merge_fields)
    s = sub.add_parser("remove-fields"); s.add_argument("tsv")
    s.add_argument("out"); s.add_argument("fields", nargs="+")
    s.set_defaults(fn=cmd_remove_fields)
    s = sub.add_parser("sort-by-keys"); s.add_argument("ref"); s.add_argument("tsv")
    s.add_argument("--out"); s.set_defaults(fn=cmd_sort_by_keys)
    s = sub.add_parser("same-keys"); s.add_argument("a"); s.add_argument("b")
    s.set_defaults(fn=cmd_same_keys)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
