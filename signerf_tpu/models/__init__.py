"""Model families: nerfacto field/sampler/renderer stack and the SIGNeRF model."""
