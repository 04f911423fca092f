"""The example notebooks (reference colab_demo.ipynb / to_onnx.ipynb /
to_trt.ipynb counterparts) must stay valid: nbformat-4 JSON, every code
cell syntactically correct Python, and every ``easy_vitpose_tpu`` symbol
they import must actually exist."""
import ast
import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples")
NOTEBOOKS = ["demo.ipynb", "export_aot.ipynb"]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_is_valid_and_compiles(name):
    nb = json.load(open(os.path.join(ROOT, name)))
    assert nb["nbformat"] == 4
    assert len(nb["cells"]) >= 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert code_cells
    for i, c in enumerate(code_cells):
        src = "".join(c["source"])
        compile(src, f"{name}[code cell {i}]", "exec")


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_imports_resolve(name):
    """Every `from easy_vitpose_tpu... import X` in the notebooks resolves —
    guards the docs against API drift."""
    import importlib
    nb = json.load(open(os.path.join(ROOT, name)))
    for c in nb["cells"]:
        if c["cell_type"] != "code":
            continue
        tree = ast.parse("".join(c["source"]))
        for node in ast.walk(tree):
            if (isinstance(node, ast.ImportFrom) and node.module
                    and node.module.startswith("easy_vitpose_tpu")):
                mod = importlib.import_module(node.module)
                for alias in node.names:
                    assert hasattr(mod, alias.name), (
                        f"{name}: {node.module}.{alias.name} missing")
