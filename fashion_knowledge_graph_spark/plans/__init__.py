"""Logical plans: the end-to-end KG build pipeline and the
recommendation query layer."""
