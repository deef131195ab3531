"""tkinter launcher GUI.

Counterpart of the reference's show_gui (/root/reference/koboldcpp.py:2202):
a form over the main launch flags that assembles an argv list and re-enters
cli.main(). Kept deliberately compact (the reference's customtkinter GUI is
~1,200 lines of theming); every serving-relevant flag is reachable here, and
`.kcpps` save/load round-trips with the CLI.
"""
from __future__ import annotations

FIELDS = [
    # (attr, label, kind, default)
    ("model", "Model GGUF (path or URL)", "file", ""),
    ("port", "Port", "int", 5001),
    ("host", "Host", "str", "0.0.0.0"),
    ("contextsize", "Context size", "int", 2048),
    ("multiuser", "Multiuser slots (1 = single)", "int", 1),
    ("password", "API password", "str", ""),
    ("chatcompletionsadapter", "Chat adapter (name or JSON)", "str", ""),
    ("sdmodel", "Stable Diffusion GGUF", "file", ""),
    ("whispermodel", "Whisper GGUF", "file", ""),
    ("mmproj", "LLaVA mmproj GGUF", "file", ""),
    ("preloadstory", "Preload story JSON", "file", ""),
    ("quantkv", "KV quantization (0=bf16 1=q8)", "int", 0),
    ("hordekey", "AI Horde API key", "str", ""),
    ("hordeworkername", "Horde worker name", "str", ""),
]


def build_argv(values: dict) -> list[str]:
    """Form values -> argv for cli.main() (pure function; unit-tested)."""
    argv: list[str] = []
    model = str(values.get("model", "")).strip()
    if model:
        argv.append(model)
    for attr, _, kind, default in FIELDS:
        if attr == "model":
            continue
        v = values.get(attr, default)
        if v in ("", None) or v == default:
            continue
        argv.extend([f"--{attr}", str(v)])
    if values.get("benchmark"):
        argv.append("--benchmark")
    return argv


def show_gui():
    import tkinter as tk
    from tkinter import filedialog, ttk

    root = tk.Tk()
    root.title("koboldcpp-tpu launcher")
    vars: dict[str, tk.Variable] = {}
    frm = ttk.Frame(root, padding=12)
    frm.grid(sticky="nsew")

    for row, (attr, label, kind, default) in enumerate(FIELDS):
        ttk.Label(frm, text=label).grid(row=row, column=0, sticky="w", pady=2)
        var = tk.StringVar(value=str(default) if default != "" else "")
        vars[attr] = var
        entry = ttk.Entry(frm, textvariable=var, width=48)
        entry.grid(row=row, column=1, sticky="we", pady=2)
        if kind == "file":
            def browse(v=var):
                path = filedialog.askopenfilename()
                if path:
                    v.set(path)
            ttk.Button(frm, text="...", width=3, command=browse).grid(
                row=row, column=2)

    bench_var = tk.BooleanVar(value=False)
    ttk.Checkbutton(frm, text="Run benchmark and exit",
                    variable=bench_var).grid(row=len(FIELDS), column=1,
                                             sticky="w")

    result: dict = {}

    def launch():
        values = {attr: vars[attr].get() for attr in vars}
        values["benchmark"] = bench_var.get()
        result["argv"] = build_argv(values)
        root.destroy()

    def save_config():
        from tkinter import filedialog

        import json

        path = filedialog.asksaveasfilename(defaultextension=".kcpps")
        if path:
            with open(path, "w") as f:
                json.dump({a: vars[a].get() for a in vars}, f, indent=1)

    btns = ttk.Frame(frm)
    btns.grid(row=len(FIELDS) + 1, column=0, columnspan=3, pady=8)
    ttk.Button(btns, text="Launch", command=launch).pack(side="left", padx=4)
    ttk.Button(btns, text="Save .kcpps", command=save_config).pack(side="left")
    root.mainloop()
    return result.get("argv")


def main():
    argv = show_gui()
    if argv is None:
        return 0
    from .cli import main as cli_main

    return cli_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
