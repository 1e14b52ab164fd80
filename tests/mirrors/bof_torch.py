"""Torch mirror of the upstream VideoFlow BOF architecture — TEST ORACLE.

The reference ships BOF as a first-class architecture (`--vf-architecture
bof`, /root/reference/flow_processor.py:1329-1330) with checkpoints named
`BOF_{dataset}[_288960noise].pth` (/root/reference/processing/
videoflow_core.py:79-85).  Upstream BOFNetStack is the tri-frame (TROF,
VideoFlow ICCV 2023 §3.1) variant of MOFNetStack: same twins_svt_large
encoders, same GMA attention, same SKFlow update family, exactly one
interior frame whose forward+backward flows are jointly refined.

What this snapshot CANNOT verify (documented, not assumed silently):
the upstream submodule is empty (`.gitmodules` pins it unvendored) and
the BOF_*.pth blobs are stripped (`.MISSING_LARGE_BLOBS`), so the exact
upstream BOFNetStack state-dict layout is unobservable here.  This
mirror therefore encodes the MOF-family layout at T=3 — the same
update-block class (`SKUpdateBlock6_Deep_nopoolres_AllDecoder2`) and
motion-hidden-state machinery, which at N=1 interior degenerates to
zero-padded neighbor shifts.  The paper describes TROF and MOF as the
same recurrent tri-frame unit (MOF = TROF splatted across the window),
so this is the documented best reconstruction.  Safety net: the
converter (runtime/convert.py map_state_dict_to_params) hard-fails
with a key-diff report on low match rate, so a real BOF_*.pth with a
different layout is REPORTED, never silently mis-loaded.
"""

from __future__ import annotations

from .mof_torch import MOFNetMirror


class BOFNetMirror(MOFNetMirror):
    """Tri-frame (T=3) instance of the MOF-family architecture: one
    interior frame, forward+backward flows of the center.  The forward
    contract matches videoflow_core.py:188-195 consumption: predictions
    indexed [0, T//2] == the single interior."""

    def forward(self, frames):
        assert frames.shape[1] == 3, "BOF consumes exactly 3 frames"
        return super().forward(frames)
