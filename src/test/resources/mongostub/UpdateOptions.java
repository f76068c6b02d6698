package com.mongodb.client.model;

public final class UpdateOptions {
    public boolean isUpsert = false;
    public UpdateOptions() {}
    public UpdateOptions upsert(boolean upsert) { this.isUpsert = upsert; return this; }
}
