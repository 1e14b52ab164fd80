"""Class-based TAA API (drop-in parity with effects/taa_processor.py).

The jit-compiled math lives in tpuflow.pipeline.ops (taa_step); these
classes add the reference's stateful conveniences: per-sequence history
dict (taa_processor.py:39), alpha management (:315-324), and the
comparison processor that runs flow-based and simple TAA side by side
(:327-384)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from . import ops


class TAAProcessor:
    """Temporal anti-aliasing with optional flow reprojection
    (taa_processor.py:20-324)."""

    def __init__(self, alpha: float = 0.1, bilateral_sigma_color: float = 25.0):
        self.alpha = alpha
        self.bilateral_sigma_color = bilateral_sigma_color
        self.history: Dict[str, np.ndarray] = {}

    def apply_taa(
        self,
        current_frame: np.ndarray,
        flow_pixels: Optional[np.ndarray] = None,
        previous_taa_frame: Optional[np.ndarray] = None,
        alpha: Optional[float] = None,
        use_flow: bool = True,
        use_bilateral: bool = True,
        sequence_id: str = "default",
    ) -> np.ndarray:
        alpha = self.alpha if alpha is None else alpha
        if previous_taa_frame is None:
            previous_taa_frame = self.history.get(sequence_id)

        if previous_taa_frame is None:
            # First frame: history seeds with the frame itself
            # (taa_processor.py:70-74).
            result = current_frame.astype(np.float32)
        else:
            result = np.asarray(
                ops.taa_step(
                    current_frame.astype(np.float32),
                    None if (not use_flow or flow_pixels is None) else flow_pixels,
                    previous_taa_frame.astype(np.float32),
                    alpha=alpha,
                    use_flow=use_flow and flow_pixels is not None,
                    use_bilateral=use_bilateral,
                    sigma_color=self.bilateral_sigma_color,
                )
            )
        self.history[sequence_id] = result
        return result

    def apply_simple_taa(
        self,
        current_frame: np.ndarray,
        previous_taa_frame: Optional[np.ndarray] = None,
        alpha: Optional[float] = None,
        sequence_id: str = "simple",
    ) -> np.ndarray:
        return self.apply_taa(
            current_frame,
            flow_pixels=None,
            previous_taa_frame=previous_taa_frame,
            alpha=alpha,
            use_flow=False,
            use_bilateral=False,
            sequence_id=sequence_id,
        )

    def reset_history(self, sequence_id: Optional[str] = None) -> None:
        if sequence_id is None:
            self.history.clear()
        else:
            self.history.pop(sequence_id, None)

    def get_history(self, sequence_id: str = "default") -> Optional[np.ndarray]:
        return self.history.get(sequence_id)

    def set_alpha(self, alpha: float) -> None:
        if not 0.0 <= alpha <= 1.0:
            raise ValueError("Alpha must be between 0.0 and 1.0")
        self.alpha = alpha


class TAAComparisonProcessor:
    """Run flow-based and simple TAA in lockstep (taa_processor.py:327-384)."""

    def __init__(self, alpha: float = 0.1):
        self.flow_taa = TAAProcessor(alpha)
        self.simple_taa = TAAProcessor(alpha)

    def apply_comparison(
        self,
        current_frame: np.ndarray,
        flow_pixels: Optional[np.ndarray] = None,
        alpha: Optional[float] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        flow_result = self.flow_taa.apply_taa(
            current_frame, flow_pixels=flow_pixels, alpha=alpha,
            use_flow=True, use_bilateral=True, sequence_id="flow",
        )
        simple_result = self.simple_taa.apply_simple_taa(
            current_frame, alpha=alpha, sequence_id="simple"
        )
        return flow_result, simple_result

    def reset_history(self) -> None:
        self.flow_taa.reset_history()
        self.simple_taa.reset_history()

    def set_alpha(self, alpha: float) -> None:
        self.flow_taa.set_alpha(alpha)
        self.simple_taa.set_alpha(alpha)


def apply_taa_effect(
    current_frame: np.ndarray,
    flow_pixels: Optional[np.ndarray] = None,
    previous_taa_frame: Optional[np.ndarray] = None,
    alpha: float = 0.1,
    use_flow: bool = True,
) -> np.ndarray:
    """Stateless convenience (taa_processor.py:387-412)."""
    return TAAProcessor(alpha).apply_taa(
        current_frame,
        flow_pixels=flow_pixels,
        previous_taa_frame=previous_taa_frame,
        alpha=alpha,
        use_flow=use_flow,
    )
