"""GUI launcher: builds and spawns the CLI from a form.

The reference's gui_runner.py (1893 LoC PyQt6 + qfluentwidgets) exposes a
form over every CLI flag, live filename/cache previews, a cache-status
badge, QSettings persistence, and launches the CLI in a new console
(gui_runner.py:142-1857).  Here the logic lives in a headless core:

- `GuiSettings` + JSON persistence   (QSettings parity, gui_runner.py:648-776)
- `build_command`                    (CLI string builder, gui_runner.py:1686-1780)
- `preview_output_path` / `preview_cache_path` + `cache_status`
  (filename previews and cache probe, gui_runner.py:1039-1124, 1317-1433)

with a thin Tk shell (`FlowRunnerApp`) on top — PyQt6 is not assumed.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..pipeline.filenames import generate_cache_directory, generate_output_filename

SETTINGS_PATH = os.path.expanduser("~/.tpuflow_gui.json")


@dataclass
class GuiSettings:
    """Every CLI-visible option the form exposes (gui_runner.py:236-259)."""

    input: str = ""
    output: str = "results"
    device: str = "auto"
    frames: int = 1000
    start_frame: int = 0
    start_time: Optional[float] = None
    duration: Optional[float] = None
    fast: bool = False
    tile: bool = False
    flow_only: bool = False
    taa: bool = False
    force_recompute: bool = False
    uncompressed: bool = False
    skip_lods: bool = False
    no_autoplay: bool = False
    flow_format: str = "gamedev"
    motion_vectors_clamp_range: float = 32.0
    sequence_length: int = 5
    save_flow: Optional[str] = None
    use_flow_cache: Optional[str] = None
    model: str = "videoflow"
    stage: str = "sintel"
    vf_dataset: str = "sintel"
    vf_architecture: str = "mof"
    vf_variant: str = "standard"

    def save(self, path: str = SETTINGS_PATH) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str = SETTINGS_PATH) -> "GuiSettings":
        if not os.path.exists(path):
            return cls()
        try:
            with open(path) as f:
                data = json.load(f)
            known = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in data.items() if k in known})
        except Exception:
            return cls()


def build_command(s: GuiSettings, python: str = sys.executable) -> List[str]:
    """CLI argv from settings (gui_runner.py:1686-1780 builds the same
    string for PowerShell; argv avoids the quoting problems)."""
    cmd = [python, "-m", "tpuflow.tools.cli", "--input", s.input, "--output", s.output]
    if s.device != "auto":
        cmd += ["--device", s.device]
    if s.frames != 1000:
        cmd += ["--frames", str(s.frames)]
    if s.start_frame:
        cmd += ["--start-frame", str(s.start_frame)]
    if s.start_time is not None:
        cmd += ["--start-time", str(s.start_time)]
    if s.duration is not None:
        cmd += ["--duration", str(s.duration)]
    for flag, on in (
        ("--fast", s.fast),
        ("--tile", s.tile),
        ("--flow-only", s.flow_only),
        ("--taa", s.taa),
        ("--force-recompute", s.force_recompute),
        ("--uncompressed", s.uncompressed),
        ("--skip-lods", s.skip_lods),
        ("--no-autoplay", s.no_autoplay),
    ):
        if on:
            cmd.append(flag)
    if s.flow_format != "gamedev":
        cmd += ["--flow-format", s.flow_format]
    if s.motion_vectors_clamp_range != 32.0:
        cmd += ["--motion-vectors-clamp-range", str(s.motion_vectors_clamp_range)]
    if s.sequence_length != 5:
        cmd += ["--sequence-length", str(s.sequence_length)]
    if s.save_flow:
        cmd += ["--save-flow", s.save_flow]
    if s.use_flow_cache:
        cmd += ["--use-flow-cache", s.use_flow_cache]
    if s.model != "videoflow":
        cmd += ["--model", s.model]
    if s.stage != "sintel":
        cmd += ["--stage", s.stage]
    if s.vf_dataset != "sintel":
        cmd += ["--vf-dataset", s.vf_dataset]
    if s.vf_architecture != "mof":
        cmd += ["--vf-architecture", s.vf_architecture]
    if s.vf_variant != "standard":
        cmd += ["--vf-variant", s.vf_variant]
    return cmd


def preview_output_path(s: GuiSettings, fps: float = 30.0) -> str:
    """Output filename preview (gui_runner.py:1317-1433 reuses the same
    generator)."""
    name = generate_output_filename(
        s.input,
        start_time=s.start_time,
        duration=s.duration,
        start_frame=s.start_frame,
        max_frames=s.frames,
        flow_only=s.flow_only,
        taa=s.taa,
        fast_mode=s.fast,
        tile_mode=s.tile,
        uncompressed=s.uncompressed,
        flow_format=s.flow_format,
        motion_vectors_clamp_range=s.motion_vectors_clamp_range,
        fps=fps,
    )
    return os.path.join(s.output, name)


def preview_cache_path(s: GuiSettings) -> str:
    return generate_cache_directory(
        s.input,
        start_frame=s.start_frame,
        max_frames=s.frames,
        sequence_length=s.sequence_length,
        fast_mode=s.fast,
        tile_mode=s.tile,
        model=s.model,
        dataset=s.vf_dataset if s.model == "videoflow" else s.stage,
        architecture=s.vf_architecture,
        variant=s.vf_variant,
    )


def cache_status(s: GuiSettings) -> Tuple[str, str]:
    """(state, detail): cache badge (gui_runner.py:1039-1124).
    States: 'none' | 'partial' | 'complete'."""
    from ..pipeline.cache import FlowCacheManager

    cache_dir = s.use_flow_cache or preview_cache_path(s)
    if not os.path.isdir(cache_dir):
        return "none", f"no cache at {cache_dir}"
    ok, fmt, missing = FlowCacheManager().check_cache_exists(cache_dir, s.frames)
    if ok:
        return "complete", f"complete ({fmt}) at {cache_dir}"
    found = s.frames - len(missing)
    return "partial", f"{found}/{s.frames} frames at {cache_dir}"


def launch_cli(s: GuiSettings) -> subprocess.Popen:
    """Spawn the CLI (the reference opens a new PowerShell console,
    gui_runner.py:1826-1857; POSIX just runs the child)."""
    return subprocess.Popen(build_command(s))


class FlowRunnerApp:
    """Thin Tk form over the headless core."""

    def __init__(self):
        import tkinter as tk
        from tkinter import filedialog, ttk

        self.tk, self.ttk, self.filedialog = tk, ttk, filedialog
        self.settings = GuiSettings.load()
        self.root = tk.Tk()
        self.root.title("tpuflow runner")
        self._vars: Dict[str, object] = {}
        self._build()

    def _build(self):
        tk, ttk = self.tk, self.ttk
        s = self.settings
        row = 0

        def add_entry(label, key, width=48):
            nonlocal row
            tk.Label(self.root, text=label).grid(row=row, column=0, sticky="w")
            var = tk.StringVar(value=str(getattr(s, key) or ""))
            tk.Entry(self.root, textvariable=var, width=width).grid(row=row, column=1, sticky="we")
            self._vars[key] = var
            row += 1

        def add_check(label, key):
            nonlocal row
            var = tk.BooleanVar(value=getattr(s, key))
            tk.Checkbutton(self.root, text=label, variable=var).grid(row=row, column=0, columnspan=2, sticky="w")
            self._vars[key] = var
            row += 1

        def add_combo(label, key, values):
            nonlocal row
            tk.Label(self.root, text=label).grid(row=row, column=0, sticky="w")
            var = tk.StringVar(value=getattr(s, key))
            ttk.Combobox(self.root, textvariable=var, values=values).grid(row=row, column=1, sticky="we")
            self._vars[key] = var
            row += 1

        add_entry("Input video", "input")
        add_entry("Output dir", "output")
        add_entry("Frames", "frames", 12)
        add_entry("Start frame", "start_frame", 12)
        add_entry("Sequence length", "sequence_length", 12)
        add_combo("Model", "model", ["videoflow", "memflow"])
        add_combo("Architecture", "vf_architecture", ["mof", "bof"])
        add_combo("Dataset", "vf_dataset", ["sintel", "things", "kitti"])
        add_combo("Variant", "vf_variant", ["standard", "noise"])
        add_combo("Flow format", "flow_format",
                  ["gamedev", "hsv", "torchvision", "motion-vectors-rg8", "motion-vectors-rgb8"])
        for label, key in [
            ("fast", "fast"), ("tile", "tile"), ("flow only", "flow_only"),
            ("TAA", "taa"), ("force recompute", "force_recompute"),
            ("uncompressed", "uncompressed"), ("skip LODs", "skip_lods"),
        ]:
            add_check(label, key)

        self.preview = tk.Label(self.root, text="", anchor="w", justify="left")
        self.preview.grid(row=row, column=0, columnspan=2, sticky="we")
        row += 1
        tk.Button(self.root, text="Preview", command=self._update_preview).grid(row=row, column=0)
        tk.Button(self.root, text="Run", command=self._run).grid(row=row, column=1)

    def _collect(self) -> GuiSettings:
        s = self.settings
        for key, var in self._vars.items():
            val = var.get()
            cur = getattr(s, key)
            if isinstance(cur, bool):
                setattr(s, key, bool(val))
            elif isinstance(cur, int):
                setattr(s, key, int(val or 0))
            elif isinstance(cur, float):
                setattr(s, key, float(val or 0))
            else:
                setattr(s, key, val or None if key in ("save_flow", "use_flow_cache") else val)
        return s

    def _update_preview(self):
        s = self._collect()
        state, detail = cache_status(s)
        self.preview.config(
            text=(
                f"output: {preview_output_path(s)}\n"
                f"cache:  {preview_cache_path(s)}\n"
                f"status: {state} — {detail}\n"
                f"cmd:    {' '.join(build_command(s))}"
            )
        )

    def _run(self):
        s = self._collect()
        s.save()
        launch_cli(s)

    def run(self):
        self.root.mainloop()


def main() -> int:
    try:
        app = FlowRunnerApp()
    except Exception as e:
        print(f"Cannot start GUI ({e}). The headless API is available via "
              "tpuflow.tools.gui (GuiSettings, build_command, launch_cli).")
        return 1
    app.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
