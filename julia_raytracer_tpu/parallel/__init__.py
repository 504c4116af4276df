"""Multi-chip distribution: device meshes, sharded rendering, grad psum."""
