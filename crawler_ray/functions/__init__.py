"""Pure, picklable operator kernels used inside ``map_batches`` bodies."""
