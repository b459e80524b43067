"""Built-in plugins (datasets and checkpoints), discovered by plugin.register()."""
