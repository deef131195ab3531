"""End-to-end quality study on reference-produced GGUF files.

Stages (each resumable; state = files on disk under WORKDIR):
  quantize  - run the REFERENCE quantize_gguf binary for every format
  refppl    - run the reference-runtime perplexity driver (perplexity_ref.cpp)
  ourppl    - run our engine's tools/perplexity.py on the same files + text
  gen       - load the q4_k_m file in our engine and greedy-generate a sample
  report    - print a markdown Δppl table (pasted into QUALITY.md)

The eval text is a prefix of the held-out split (never seen in training), and
the token streams are identical on both sides (verified: our tokenizer output
is asserted against the reference's llama_tokenize over the whole eval text).

Usage: python tools/realmodel/run_quality.py WORKDIR [--stages quantize,refppl,...]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

FORMATS = [
    "Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0",
    "Q2_K", "Q3_K_M", "Q4_K_S", "Q4_K_M", "Q5_K_M", "Q6_K",
    "IQ4_NL", "IQ4_XS",
    "TQ1_0", "TQ2_0",
    # imatrix-required formats: files quantized by the REFERENCE binary
    # consuming OUR collected imatrix (tools/imatrix.py --bin)
    "IQ3_XXS-IM", "IQ3_S-IM", "IQ2_XXS-IM", "IQ2_XS-IM", "IQ2_S-IM",
    "IQ2_M-IM", "IQ1_S-IM", "IQ1_M-IM",
]

EVAL_BYTES = 150_000   # ~36K tokens -> ~70 windows of 512


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, **kw)


def stage_quantize(wd, ref):
    f16 = os.path.join(wd, "gguf", "model-f16.gguf")
    imatrix = os.path.join(wd, "imatrix.bin")
    for fmt in FORMATS:
        out = os.path.join(wd, "gguf", f"model-{fmt.lower()}.gguf")
        if os.path.exists(out):
            continue
        cmd = [os.path.join(ref, "quantize_gguf")]
        base = fmt
        if fmt.endswith("-IM"):
            base = fmt[:-3]
            cmd += ["--imatrix", imatrix]
        try:
            sh(cmd + [f16, out, base, "2"], stdout=subprocess.DEVNULL)
        except subprocess.CalledProcessError as e:
            print(f"!! {fmt} failed ({e.returncode}) — skipped")


def _eval_file(wd):
    path = os.path.join(wd, "eval_ppl.txt")
    if not os.path.exists(path):
        with open("/tmp/realmodel/corpus/eval.txt") as fh:
            text = fh.read()[:EVAL_BYTES]
        with open(path, "w") as fh:
            fh.write(text)
    return path


def stage_refppl(wd, ref):
    evalf = _eval_file(wd)
    results = _load(wd, "ref_ppl.json")
    for fmt in ["F16"] + FORMATS:
        if fmt in results:
            continue
        model = os.path.join(wd, "gguf", f"model-{fmt.lower()}.gguf")
        if not os.path.exists(model):
            continue
        try:
            r = sh([os.path.join(ref, "perplexity_ref"), model, evalf, "512"],
                   capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            print(f"!! refppl {fmt} failed: {e.stderr[-300:] if e.stderr else e}")
            continue
        m = re.search(r"FINAL_PPL ([0-9.]+) tokens (\d+)", r.stdout)
        results[fmt] = {"ppl": float(m.group(1)), "tokens": int(m.group(2))}
        print(f"ref {fmt}: {results[fmt]}")
        _save(wd, "ref_ppl.json", results)


def stage_ourppl(wd, packed=True):
    evalf = _eval_file(wd)
    name = "our_ppl.json" if packed else "our_ppl_xla.json"
    results = _load(wd, name)
    env = dict(os.environ)
    if not packed:
        env["KCPP_PALLAS_MM"] = "0"
    for fmt in ["F16"] + FORMATS:
        if fmt in results:
            continue
        model = os.path.join(wd, "gguf", f"model-{fmt.lower()}.gguf")
        if not os.path.exists(model):
            continue
        m = None
        for attempt in range(2):  # axon tunnel stalls are flaky; one retry
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "tools", "perplexity.py"),
                     model, "--file", evalf, "--ctx", "512"],
                    capture_output=True, text=True, env=env, timeout=300)
            except subprocess.TimeoutExpired:
                print(f"!! ourppl {fmt} timed out (attempt {attempt + 1})")
                continue
            m = re.search(r"Final perplexity: ([0-9.]+)", r.stdout)
            if m:
                break
            print(f"!! ourppl {fmt} failed:\n{r.stdout[-500:]}\n{r.stderr[-2000:]}")
        if not m:
            continue
        results[fmt] = {"ppl": float(m.group(1))}
        print(f"ours {fmt}: {results[fmt]}")
        _save(wd, name, results)


# formats whose QUANTIZERS landed in r3 (VERDICT r3 item 8: the files our
# tools/quantize.py produces need ppl evidence vs the reference-quantized
# files, both judged by the REFERENCE runtime)
OUR_QUANT_FORMATS = ["IQ1_S", "IQ1_M", "IQ2_XXS", "IQ2_XS", "IQ2_S",
                     "IQ3_XXS", "IQ3_S", "TQ1_0", "TQ2_0"]


def stage_ourquant(wd):
    """Quantize the f16 GGUF with OUR tools/quantize.py (our .npz imatrix)
    for every r3-landed low-bit format."""
    f16 = os.path.join(wd, "gguf", "model-f16.gguf")
    imx = os.path.join(wd, "imatrix.npz")
    for fmt in OUR_QUANT_FORMATS:
        out = os.path.join(wd, "gguf", f"model-{fmt.lower()}-ours.gguf")
        if os.path.exists(out):
            continue
        sh([sys.executable, os.path.join(REPO, "tools", "quantize.py"),
            f16, out, fmt.lower(), "--imatrix", imx])


def stage_refppl_ours(wd, ref):
    """Reference-runtime perplexity on OUR-quantized files — the strongest
    cross-check: the reference evaluates files we produced."""
    evalf = _eval_file(wd)
    results = _load(wd, "ref_ppl_ours.json")
    for fmt in OUR_QUANT_FORMATS:
        if fmt in results:
            continue
        model = os.path.join(wd, "gguf", f"model-{fmt.lower()}-ours.gguf")
        if not os.path.exists(model):
            continue
        try:
            r = sh([os.path.join(ref, "perplexity_ref"), model, evalf, "512"],
                   capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            print(f"!! refppl-ours {fmt} failed: "
                  f"{e.stderr[-300:] if e.stderr else e}")
            continue
        m = re.search(r"FINAL_PPL ([0-9.]+) tokens (\d+)", r.stdout)
        results[fmt] = {"ppl": float(m.group(1)), "tokens": int(m.group(2))}
        print(f"ref(ours-quantized) {fmt}: {results[fmt]}")
        _save(wd, "ref_ppl_ours.json", results)


def stage_report_ours(wd):
    """Markdown table: ppl of our-quantized vs reference-quantized files,
    both evaluated by the reference runtime (QUALITY.md v2)."""
    ours = _load(wd, "ref_ppl_ours.json")
    ref = _load(wd, "ref_ppl.json")
    print("| format | ref-quantized ppl | OURS-quantized ppl | delta |")
    print("|---|---|---|---|")
    for fmt in OUR_QUANT_FORMATS:
        rkey = fmt + "-IM" if fmt.startswith("IQ") else fmt
        if fmt not in ours or rkey not in ref:
            continue
        a, b = ref[rkey]["ppl"], ours[fmt]["ppl"]
        print(f"| {fmt} | {a:.4f} | {b:.4f} | {b - a:+.4f} |")


def stage_tokparity(wd, ref):
    """Assert our tokenizer and the reference's produce identical ids on the
    eval text (windowing identity precondition for the Δppl comparison)."""
    evalf = _eval_file(wd)
    model = os.path.join(wd, "gguf", "model-f16.gguf")
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tokenize_ref.cpp")
    binp = os.path.join(ref, "tokenize_ref")
    if not os.path.exists(binp):
        sh(["g++", "-I" + ref, "-I" + ref + "/ggml/include", "-I" + ref + "/include",
            "-O2", "-std=c++11", "-pthread", src] +
           [os.path.join(ref, o) for o in
            ("ggml.o", "llama.o", "ggml-backend_default.o", "ggml-alloc.o",
             "ggml-aarch64.o", "ggml-quants.o", "unicode.o", "unicode-data.o",
             "sgemm.o", "llavaclip_default.o", "llava.o")] + ["-o", binp])
    r = sh([binp, model, evalf], capture_output=True, text=True)
    ref_ids = [int(x) for x in r.stdout.split()]

    from koboldcpp_tpu.tokenizers import Tokenizer
    from koboldcpp_tpu.gguf.reader import GGUFReader
    rd = GGUFReader(model)
    tk = Tokenizer.from_metadata(rd.metadata)
    with open(evalf) as fh:
        ours = tk.encode(fh.read())
    assert list(ours) == ref_ids, (
        f"tokenizer divergence: ours {len(ours)} vs ref {len(ref_ids)} tokens; "
        f"first diff at {next((i for i, (a, b) in enumerate(zip(ours, ref_ids)) if a != b), 'len')}")
    print(f"tokenizer parity OK ({len(ref_ids)} tokens)")


def stage_gen(wd):
    from koboldcpp_tpu.models.loader import load_model
    from koboldcpp_tpu.engine.engine import Engine, GenParams
    from koboldcpp_tpu.sampling.samplers import SamplerParams

    results = {}
    for fmt in ("q4_k_m", "f16"):
        model = os.path.join(wd, "gguf", f"model-{fmt}.gguf")
        eng = Engine(load_model(model), max_context=1024)
        prompt = "The gradient of a function"
        params = GenParams(max_length=64, sampler=SamplerParams(temperature=0.0))
        out = eng.generate(prompt, params)
        print(f"[{fmt}] PROMPT: {prompt}\n[{fmt}] OUTPUT: {out.text}")
        results[fmt] = {"prompt": prompt, "output": out.text}
    _save(wd, "gen_sample.json", results)


def stage_report(wd):
    ref = _load(wd, "ref_ppl.json")
    ours = _load(wd, "our_ppl.json")
    xla = _load(wd, "our_ppl_xla.json")
    base_ref = ref.get("F16", {}).get("ppl")
    base_ours = ours.get("F16", {}).get("ppl")
    print(f"| Format | ref ppl | ref Δppl | ours ppl (packed) | ours Δppl | ours ppl (XLA dequant) |")
    print(f"|---|---|---|---|---|---|")
    for fmt in ["F16"] + FORMATS:
        r = ref.get(fmt, {}).get("ppl")
        o = ours.get(fmt, {}).get("ppl")
        x = xla.get(fmt, {}).get("ppl")
        if r is None and o is None:
            continue
        rd = f"{r - base_ref:+.4f}" if r and base_ref else "—"
        od = f"{o - base_ours:+.4f}" if o and base_ours else "—"
        print(f"| {fmt} | {r or '—'} | {rd} | {o or '—'} | {od} | {x or '—'} |")


def _load(wd, name):
    p = os.path.join(wd, name)
    return json.load(open(p)) if os.path.exists(p) else {}


def _save(wd, name, obj):
    with open(os.path.join(wd, name), "w") as fh:
        json.dump(obj, fh, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/realmodel")
    ap.add_argument("--ref", default="/tmp/refbuild")
    ap.add_argument("--stages", default="quantize,tokparity,refppl,ourppl,gen,report")
    args = ap.parse_args()
    for st in args.stages.split(","):
        print(f"=== stage {st} ===", flush=True)
        if st == "quantize":
            stage_quantize(args.workdir, args.ref)
        elif st == "tokparity":
            stage_tokparity(args.workdir, args.ref)
        elif st == "refppl":
            stage_refppl(args.workdir, args.ref)
        elif st == "ourppl":
            stage_ourppl(args.workdir, packed=True)
        elif st == "ourppl_xla":
            stage_ourppl(args.workdir, packed=False)
        elif st == "gen":
            stage_gen(args.workdir)
        elif st == "report":
            stage_report(args.workdir)
        elif st == "ourquant":
            stage_ourquant(args.workdir)
        elif st == "refppl_ours":
            stage_refppl_ours(args.workdir, args.ref)
        elif st == "report_ours":
            stage_report_ours(args.workdir)
        else:
            raise SystemExit(f"unknown stage {st}")


if __name__ == "__main__":
    main()
