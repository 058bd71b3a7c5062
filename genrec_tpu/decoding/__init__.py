from .trie import DEAD, ROOT, TrieTables, build_trie_tables
from .beam import BeamSearchOutput, BeamState, beam_search

__all__ = ["DEAD", "ROOT", "TrieTables", "build_trie_tables",
           "BeamSearchOutput", "BeamState", "beam_search"]
