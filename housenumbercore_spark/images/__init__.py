"""Image payload plumbing: codecs, perceptual hash, PSNR invariants."""
