"""Sample ingest and synthesis.

Replaces the reference's sources: `twinrx_usrp_source` (hardware — out of
scope here, its phase-coherence contract is modeled by the synthetic
generator + calibration stages), GNU Radio file sources (→ recorded-IQ
reader, raw interleaved complex64 compatible with gr file_sink), and the
simulation flowgraph's signal model (→ synthetic generators, SURVEY §3.2).
"""

from doa_tpu.io.synthetic import synth_ula_iq, synth_ura_iq, SourceSpec
from doa_tpu.io.recorded import save_iq, load_iq

__all__ = ["synth_ula_iq", "synth_ura_iq", "SourceSpec", "save_iq", "load_iq"]
