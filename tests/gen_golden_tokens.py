"""Generate golden token fixtures from the reference tokenizer (run once).

Oracle: `/root/reference/src/open_clip/tokenizer.py` SimpleTokenizer. We run
the reference implementation on a fixed caption set and store its token ids as
JSON so the test suite never needs the reference tree or torch at test time.
"""

import importlib.util
import json
import os

CAPTIONS = [
    "A brain MRI, plane axial, Scanner (Manufacturer, Model, Field Strength): "
    "(SIEMENS, Prisma, 3.0T), Acquisition (Description, Sequence, Variant): "
    "(t2_tse_tra, SE, SK), Imaging Parameters (Echo Time, Repetition Time, "
    "Inversion Time, Flip Angle): (0.093, 9.0, nan, 150)",
    "a photo of a cat",
    "Hello, World! 123 -- MRI T1-weighted scan @ 1.5T",
    "",
    "x" * 500,
    "Ünïcödé çaptïon with Ńon-ASCII characters — em-dash",
]


def main():
    # ftfy is not installed in this image; both the reference (here) and the
    # new tokenizer fall back to identity text fixing, so goldens stay valid.
    import sys
    import types

    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda x: x
        sys.modules["ftfy"] = stub

    # Load the module standalone: the reference package __init__ pulls in
    # torchvision, which is absent in this image.
    spec = importlib.util.spec_from_file_location(
        "ref_tokenizer", "/root/reference/src/open_clip/tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    tok = mod.SimpleTokenizer()
    out = {
        "context_length": tok.context_length,
        "sot": tok.sot_token_id,
        "eot": tok.eot_token_id,
        "vocab_size": tok.vocab_size,
        "captions": CAPTIONS,
        "tokens": [tok([c]).numpy()[0].tolist() for c in CAPTIONS],
        "encode": [tok.encode(c) for c in CAPTIONS],
    }
    path = os.path.join(os.path.dirname(__file__), "golden_tokens.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
