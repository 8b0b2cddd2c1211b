"""Scale-out: device meshes, sharded pair batching, pod-wide kNN, collectives."""
