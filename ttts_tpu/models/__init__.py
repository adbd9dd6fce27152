"""Model zoo: codec, GPT, diffusion net, vocoder, CLVP, classifier."""
