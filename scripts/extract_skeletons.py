"""One-off: extract skeleton *data* (keypoint names + bone lists) from the
reference's ``vit_utils/visualization.py`` (joints_dict, lines 13-355) via AST.

These are public dataset facts (COCO/MPII/AIC/AP10k/APT36k/WholeBody keypoint
taxonomies), not code.  The generated module is data-only.
"""
import ast
import pprint
import sys

SRC = "/root/reference/easy_ViTPose/vit_utils/visualization.py"
DST = "/root/repo/easy_vitpose_tpu/skeletons_data.py"


def main():
    tree = ast.parse(open(SRC).read())
    fn = next(n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef) and n.name == "joints_dict")
    # joints_dict builds a dict literal assigned to `joints` then returns it.
    joints = None
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name) and node.targets[0].id == "joints":
            joints = ast.literal_eval(node.value)
    assert joints is not None
    with open(DST, "w") as f:
        f.write('"""Skeleton data for all supported datasets (auto-generated, data-only).\n\n')
        f.write("Keypoint names and bone connectivity per dataset, matching the reference\n")
        f.write("joints_dict() (reference vit_utils/visualization.py:13-355).  Public dataset\n")
        f.write('taxonomy facts: COCO, COCO+feet(25), WholeBody(133), MPII, AIC, AP10k, APT36k.\n"""\n\n')
        f.write("JOINTS = ")
        f.write(pprint.pformat(joints, width=100, sort_dicts=False))
        f.write("\n")
    print("wrote", DST, "datasets:", list(joints))


if __name__ == "__main__":
    sys.exit(main())
