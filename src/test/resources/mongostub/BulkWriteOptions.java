package com.mongodb.client.model;

public final class BulkWriteOptions {
    public boolean isOrdered = true;
    public BulkWriteOptions() {}
    public BulkWriteOptions ordered(boolean ordered) { this.isOrdered = ordered; return this; }
}
