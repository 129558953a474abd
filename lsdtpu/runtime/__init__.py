from lsdtpu.runtime.loop import (MapContext, TrackState, init_state,
                                 localization_step, make_map_context,
                                 run_sequence, stack_frames)

__all__ = ["MapContext", "TrackState", "init_state", "localization_step",
           "make_map_context", "run_sequence", "stack_frames"]
