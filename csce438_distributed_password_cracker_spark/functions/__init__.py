"""Column-expression libraries: JVM-side native expressions first."""
