from lsdtpu.match.associate import (Candidates, fuse, generate_candidates,
                                    score_candidates)

__all__ = ["Candidates", "fuse", "generate_candidates", "score_candidates"]
