"""Dataset constructors for the engine's inputs."""
