"""Training harness: optax train states, jitted train steps, checkpoints."""
