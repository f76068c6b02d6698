package com.mongodb.bulk;

public class BulkWriteError {
    private final String message;
    public BulkWriteError(String message) { this.message = message; }
    public String getMessage() { return message; }
}
