"""map_batches stage callables: stateless parse fns, stateful actors."""
